package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{IcebergHashing, TextHashUtil}
import graft.schema.SchemaEvolution
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck property tests for the pure kernels (SURVEY §5: property
  * tests for the conversion lattice / hashing / VTTS subtleties).
  */
object HashingProps extends Properties("hashing") {

  property("bucket is always in [0, n)") = forAll(Gen.long, Gen.choose(1, 1 << 20)) {
    (v, n) =>
      val b = IcebergHashing.bucketLong(v, n)
      b >= 0 && b < n
  }

  property("ints and longs hash identically (Iceberg spec rule)") =
    forAll(Gen.choose(Int.MinValue, Int.MaxValue)) { i =>
      IcebergHashing.hashLong(i.toLong) == IcebergHashing.hashLong(i.toInt.toLong)
    }

  property("string bucket is stable across encodings of the same text") =
    forAll(Gen.alphaNumStr, Gen.choose(1, 4096)) { (s, n) =>
      val a = IcebergHashing.bucketBytes(s.getBytes("UTF-8"), n)
      val b = IcebergHashing.bucketUTF8(UTF8String.fromString(s), n)
      a == b
    }

  private val P = (BigInt(1) << 61) - 1

  property("rolling hash stays in [0, 2^61-1)") = forAll(Gen.asciiPrintableStr) { s =>
    val h = TextHashUtil.rollingHash(UTF8String.fromString(s))
    h >= 0 && BigInt(h) < P
  }

  property("rolling hash composes: h(a++b) = h(a)*257^|b| + h(b) mod p") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val ha = BigInt(TextHashUtil.rollingHash(UTF8String.fromString(a)))
      val hb = BigInt(TextHashUtil.rollingHash(UTF8String.fromString(b)))
      val hab = BigInt(TextHashUtil.rollingHash(UTF8String.fromString(a + b)))
      val blen = b.getBytes("UTF-8").length
      hab == (ha * BigInt(257).modPow(blen, P) + hb).mod(P)
    }

  property("simhash of identical text is identical; of permuted tokens too (bag-of-words)") =
    forAll(Gen.nonEmptyListOf(Gen.identifier)) { tokens =>
      val t1 = tokens.mkString(" ")
      val t2 = scala.util.Random.shuffle(tokens).mkString(" ")
      TextHashUtil.simHash64(UTF8String.fromString(t1)) ==
        TextHashUtil.simHash64(UTF8String.fromString(t2))
    }
}

object SchemaProps extends Properties("schema-evolution") {
  import org.apache.spark.sql.types._

  private val genField: Gen[StructField] = for {
    name <- Gen.identifier.map(_.take(8))
    dt <- Gen.oneOf(IntegerType, LongType, FloatType, DoubleType, StringType, BooleanType)
    nullable <- Gen.oneOf(true, false)
  } yield StructField(name, dt, nullable)

  private val genSchema: Gen[StructType] =
    Gen.nonEmptyListOf(genField).map(fs => StructType(fs.distinctBy(_.name.toLowerCase)))

  property("evolution is idempotent: second evolve is a no-op") =
    forAll(genSchema, genSchema) { (table, incoming) =>
      SchemaEvolution.evolve(table, incoming) match {
        case None          => Prop.passed
        case Some(evolved) => Prop(SchemaEvolution.evolve(evolved, incoming).isEmpty)
      }
    }

  property("evolved schema keeps every table field and covers every incoming field") =
    forAll(genSchema, genSchema) { (table, incoming) =>
      val evolved = SchemaEvolution.evolve(table, incoming).getOrElse(table)
      val names = evolved.fieldNames.map(_.toLowerCase).toSet
      table.fieldNames.forall(f => names.contains(f.toLowerCase)) &&
      incoming.fieldNames.forall(f => names.contains(f.toLowerCase))
    }

  property("widening is one-way: never narrows") =
    forAll(genSchema, genSchema) { (table, incoming) =>
      val evolved = SchemaEvolution.evolve(table, incoming).getOrElse(table)
      table.fields.forall { tf =>
        val ef = evolved.fields.find(_.name.equalsIgnoreCase(tf.name)).get
        (tf.dataType, ef.dataType) match {
          case (a, b) if a == b        => true
          case (IntegerType, LongType) => true
          case (FloatType, DoubleType) => true
          case _                       => false
        }
      }
    }
}

/** The streaming sessionization state fold must agree with the direct
  * batch gap-split on EVERY way of cutting the event stream into
  * micro-batches — the exactly-once-across-restarts contract.
  */
object SessionizeProps extends Properties("sessionize") {
  import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
  import graft.streaming.{Session, SessionState, Sessionize}

  private val Gap = 10L

  /** Direct reference: split a sorted series at >Gap gaps. */
  private def direct(ts: List[Long]): List[(Long, Long, Long)] =
    ts.foldLeft(List.empty[(Long, Long, Long)]) {
      case (Nil, t) => List((t, t, 1L))
      case ((s, last, n) :: rest, t) =>
        if (t - last > Gap) (t, t, 1L) :: (s, last, n) :: rest
        else (s, t, n + 1L) :: rest
    }.reverse

  private val genSeries = Gen.listOf(Gen.choose(0L, 300L)).map(_.sorted)
  private val genCuts = Gen.listOf(Gen.choose(0, 50))

  property("any micro-batch split folds to the batch gap-split") =
    forAll(genSeries, genCuts) { (ts, cutsRaw) =>
      // cut the sorted series into consecutive batches at the cut points
      val cuts = cutsRaw.map(c => if (ts.isEmpty) 0 else c % (ts.size + 1)).sorted.distinct
      val batches = (0 :: cuts ::: List(ts.size)).distinct.sorted
        .sliding(2).collect { case List(a, b) if b > a => ts.slice(a, b) }.toList
      var state: Option[SessionState] = None
      val emitted = scala.collection.mutable.Buffer[Session]()
      batches.foreach { b =>
        val gs = TestGroupState.create[SessionState](
          state.map(org.apache.spark.api.java.Optional.of[SessionState])
            .getOrElse(org.apache.spark.api.java.Optional.empty[SessionState]()),
          GroupStateTimeout.NoTimeout, 0L,
          org.apache.spark.api.java.Optional.empty[Long](),
          hasTimedOut = false)
        emitted ++= Sessionize.update(Gap, 0L)(1L, b.map(t => (1L, t)).iterator, gs)
        if (gs.exists) state = Some(gs.get)
      }
      val open = state.filter(_.n > 0).map(s => (s.start, s.last, s.n)).toList
      val got = emitted.map(s => (s.start_us, s.end_us, s.events)).toList ++ open
      Prop(got == direct(ts)) :| s"got=$got expected=${direct(ts)} batches=$batches"
    }

  property("idle timeout flushes the open session, keeping the sid counter tombstone") =
    forAll(Gen.choose(0L, 100L), Gen.choose(1L, 20L)) { (start, n) =>
      val gs = TestGroupState.create[SessionState](
        org.apache.spark.api.java.Optional.of(SessionState(3L, start, start + n, n)),
        GroupStateTimeout.ProcessingTimeTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = true)
      val out = Sessionize.update(Gap, 1000L)(7L, Iterator.empty, gs).toList
      // state is REDUCED to a counter-only tombstone, never removed: a
      // removal would restart session_id at 0 when the key returns,
      // breaking (key, sid) uniqueness over the stream's lifetime
      val tomb = gs.exists && gs.get == SessionState(4L, 0L, 0L, 0L)
      Prop(out == List(Session(7L, 3L, start, start + n, n)) && tomb) :|
        s"timeout flush wrong: $out state=${if (gs.exists) gs.get else "removed"}"
    }

  property("cross-batch late events never move the open session backwards") =
    forAll(Gen.choose(0L, 50L)) { late =>
      // batch 1 advances to t=100; batch 2 delivers a LATE event then an
      // in-order one within the gap — the session must keep end >= 100,
      // count the late arrival, and not split
      var gs = TestGroupState.create[SessionState](
        org.apache.spark.api.java.Optional.empty[SessionState](),
        GroupStateTimeout.NoTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
      Sessionize.update(Gap, 0L)(1L, Iterator((1L, 100L)), gs)
      val st1 = gs.get
      gs = TestGroupState.create[SessionState](
        org.apache.spark.api.java.Optional.of(st1),
        GroupStateTimeout.NoTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
      val out = Sessionize.update(Gap, 0L)(1L, Iterator((1L, late), (1L, 105L)), gs).toList
      val st = gs.get
      Prop(out.isEmpty && st.start == 100L && st.last == 105L && st.n == 3L) :|
        s"late=$late emitted=$out state=$st"
    }
}

/** Pure-kernel properties for the curation operators. */
object CurationProps extends Properties("curation") {
  import graft.operators.Sampling

  property("sampling bucket is always in [0, P) and deterministic") =
    forAll(Gen.choose(0L, Long.MaxValue / 2), Gen.long) { (key, seed) =>
      val b = ((math.floorMod(key + seed, Sampling.P)) * Sampling.A + Sampling.B) % Sampling.P
      b >= 0 && b < Sampling.P
    }

  property("minhash params are deterministic per seed and within [1,p)×[0,p)") =
    forAll(Gen.choose(1, 64), Gen.long) { (k, seed) =>
      val (a1, b1) = TextHashUtil.minhashParams(k, seed)
      val (a2, b2) = TextHashUtil.minhashParams(k, seed)
      val p = TextHashUtil.Mod
      // a strictly < p: a == p ≡ 0 (mod p) would be a CONSTANT permutation
      a1.sameElements(a2) && b1.sameElements(b2) &&
        a1.forall(a => a >= 1 && a < p) && b1.forall(b => b >= 0 && b < p)
    }

  property("hyperplane plane matrix is table-seed separable") =
    forAll(Gen.choose(1, 8), Gen.choose(1, 4), Gen.choose(2, 16)) { (bits, tables, dim) =>
      val m = graft.functions.HyperplaneSignatures.planeMatrix(bits, tables, dim, baseSeed = 7)
      // table t's block equals a 1-table matrix built from seed 7+t
      (0 until tables).forall { t =>
        val single = graft.functions.HyperplaneSignatures.planeMatrix(bits, 1, dim, 7L + t)
        m.slice(t * bits * dim, (t + 1) * bits * dim).sameElements(single)
      }
    }
}
