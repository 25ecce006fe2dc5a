package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.{EngineConfig, TableConfig}

class CdcOpsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("op extraction: first char of trimmed uppercase; null/empty/other → INSERT (D1)") {
    val df = Seq(
      ("update", 1), ("u", 2), (" Updated ", 3), ("d", 4), ("DELETE", 5),
      ("c", 6), ("r", 7), ("", 8), (null.asInstanceOf[String], 9)
    ).toDF("op", "id")
    val got = df.select(col("id"), CdcOps.opColumn(Some("op"), upsertMode = false).as("o"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "U", 2 -> "U", 3 -> "U", 4 -> "D", 5 -> "D",
      6 -> "I", 7 -> "I", 8 -> "I", 9 -> "I"))
  }

  test("upsert mode forces UPDATE regardless of cdc field (D3)") {
    val df = Seq(("d", 1)).toDF("op", "id")
    val got = df.select(CdcOps.opColumn(Some("op"), upsertMode = true)).head().getString(0)
    assert(got === "U")
  }

  test("within-batch last-wins resolution (D2/D4)") {
    val df = Seq(
      (1L, "v1", "I", 10L), (1L, "v2", "U", 11L), // update same key later
      (2L, "w1", "I", 12L), (2L, null, "D", 13L), // delete same key later
      (3L, "x1", "I", 14L)
    ).toDF("id", "payload", CdcOps.OpCol, CdcOps.OrdCol)
    val (data, dels) = CdcOps.resolveBatch(df, Seq("id"))
    val dataRows = data.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dataRows === Seq((1L, "v2"), (3L, "x1")))
    assert(dels.as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("delete-then-reinsert still equality-deletes the key's prior-commit rows") {
    // the reference replays ops sequentially (BaseDeltaTaskWriter.write:
    // 71-84): D deletes prior state even when a later I reinserts the
    // key. Pre-fix the delete keyed on the FINAL op alone, so [D, I]
    // emitted no delete and the stale prior-commit row survived beside
    // the reinsert. Pure-insert keys must still emit NO delete (the
    // all-insert-batch-carries-no-delete-file property).
    val df = Seq(
      (1L, "v1", "D", 10L), (1L, "v2", "I", 11L), // delete then reinsert
      (2L, "w1", "U", 12L), (2L, "w2", "I", 13L), // update then insert
      (3L, "x1", "I", 14L), (3L, "x2", "I", 15L)  // pure inserts
    ).toDF("id", "payload", CdcOps.OpCol, CdcOps.OrdCol)
    val (data, dels) = CdcOps.resolveBatch(df, Seq("id"))
    val dataRows = data.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dataRows === Seq((1L, "v2"), (2L, "w2"), (3L, "x2")))
    assert(dels.as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("null offsets: last-wins still picks a present row (nulls sort lowest, " +
    "matching the pre-r17 window's DESC NULLS LAST — max_by must not yield a null struct)") {
    val df = Seq(
      (1L, "v1", "U", Some(10L)), (1L, "v2", "U", None), // null loses to 10
      (2L, "w1", "U", None), (2L, "w2", "U", None)       // all-null: a row, not a null struct
    ).toDF("id", "payload", CdcOps.OpCol, CdcOps.OrdCol)
    val (data, _) = CdcOps.resolveBatch(df, Seq("id"))
    val rows = data.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.head === ((1L, "v1")), s"non-null offset must win over null: $rows")
    assert(rows.size === 2 && rows(1)._2 != null,
      s"an all-null-offset key must still resolve to one real row: $rows")
  }

  test("CDC requires id columns (Utilities.java:169-178 parity)") {
    val df = Seq((1L, "I", 0L)).toDF("id", CdcOps.OpCol, CdcOps.OrdCol)
    assertThrows[IllegalArgumentException](CdcOps.resolveBatch(df, Nil))
  }
}

class RoutingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    ("orders", 1), ("orders_eu", 2), ("shipments", 3), (null.asInstanceOf[String], 4)
  ).toDF("dest", "id")

  test("programmatic EngineConfig: listed tables inherit default id/partition columns") {
    // fromProperties pre-fills defaults; a directly constructed config must
    // behave the same (empty = inherit, not opt-out)
    val cfg = EngineConfig("/tmp/x",
      tables = Seq(TableConfig("t"), TableConfig("u", idColumns = Seq("k"))),
      defaultIdColumns = Seq("id"), defaultPartitionBy = Seq("day(ts)"))
    assert(cfg.tableConfig("t").idColumns === Seq("id"))
    assert(cfg.tableConfig("t").partitionBy === Seq("day(ts)"))
    assert(cfg.tableConfig("u").idColumns === Seq("k")) // own setting wins
    assert(cfg.tableConfig("u").partitionBy === Seq("day(ts)"))
    assert(cfg.tableConfig("v").idColumns === Seq("id")) // unlisted path unchanged
  }

  test("no route field broadcasts to all tables (R1)") {
    val cfg = EngineConfig("/tmp/x", tables = Seq(TableConfig("a"), TableConfig("b")))
    val routed = Routing.route(df, cfg)
    assert(routed.map(_._1.name) === Seq("a", "b"))
    assert(routed.forall(_._2.count() === 4))
  }

  test("static regex routing is full-match and drops null route values (R2/R7)") {
    val cfg = EngineConfig("/tmp/x",
      tables = Seq(
        TableConfig("o", routeRegex = Some("orders")),      // must NOT match orders_eu
        TableConfig("all_o", routeRegex = Some("orders.*"))
      ),
      routeField = Some("dest"))
    val byName = Routing.route(df, cfg).map { case (t, d) =>
      t.name -> d.select("id").as[Int].collect().sorted.toSeq
    }.toMap
    assert(byName("o") === Seq(1))
    assert(byName("all_o") === Seq(1, 2))
  }

  test("dynamic routing discovers lowercased route values (R3)") {
    val cfg = EngineConfig("/tmp/x", routeField = Some("dest"), dynamicRouting = true)
    val routed = Routing.route(df.withColumn("dest", upper(col("dest"))), cfg)
    assert(routed.map(_._1.name) === Seq("orders", "orders_eu", "shipments"))
  }

  test("dynamic routing refuses route values that are not table identifiers (path traversal)") {
    val cfg = EngineConfig("/tmp/x", routeField = Some("dest"), dynamicRouting = true)
    // ".." / "a." / "." would pass a split('.')-segments check vacuously
    // (Java split strips trailing empties) and derive warehouse-root paths
    for (evil <- Seq("../../tmp/evil", "a/b", "db..t", ".hidden", "", "..", "a.", ".")) {
      val bad = Seq((1L, evil)).toDF("id", "dest")
      val e = intercept[IllegalArgumentException](Routing.route(bad, cfg))
      assert(e.getMessage.contains("not a valid table identifier"), s"value: '$evil'")
    }
    // dotted catalog names remain fine
    val ok = Seq((1L, "db.events_2024")).toDF("id", "dest")
    assert(Routing.route(ok, cfg).map(_._1.name) === Seq("db.events_2024"))
  }

  test("tombstone filter drops null-value records on kafka-shaped batches only (R6)") {
    val kafka = Seq(
      ("t", 0, 0L, "x"), ("t", 0, 1L, null.asInstanceOf[String])
    ).toDF("topic", "partition", "offset", "value")
    assert(Routing.dropTombstones(kafka).count() === 1)
    // non-kafka batch with a coincidental `value` column passes through
    val plain = Seq((1, "x"), (2, null.asInstanceOf[String])).toDF("id", "value")
    assert(Routing.dropTombstones(plain).count() === 2)
  }

  test("deadLetterSplit: poison AND null-validity rows land in the DLQ slice") {
    val df = Seq((1L, """{"a":1}"""), (2L, "not json"), (3L, null.asInstanceOf[String]))
      .toDF("id", "payload")
    val (ok, dead) = Routing.deadLetterSplit(df,
      try_parse_json(col("payload")).isNotNull, lit("bad json"))
    assert(ok.select("id").as[Long].collect().toSeq === Seq(1L))
    // row 3's validity is NULL (null payload) — it must be dead, not lost
    assert(dead.select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    assert(dead.select("_dlq.reason").as[String].collect().forall(_ == "bad json"))
    // the two slices partition the batch: nothing dropped, nothing doubled
    assert(ok.count() + dead.count() === df.count())
  }
}

class SchemaEvolutionSuite extends AnyFunSuite {
  import org.apache.spark.sql.types._
  import graft.schema.SchemaEvolution

  test("widen int→long and float→double only (E1)") {
    assert(SchemaEvolution.widen(IntegerType, LongType) === Some(LongType))
    assert(SchemaEvolution.widen(FloatType, DoubleType) === Some(DoubleType))
    assert(SchemaEvolution.widen(LongType, IntegerType) === None)
    assert(SchemaEvolution.widen(IntegerType, DoubleType) === None)
  }

  test("evolve: add columns, widen, make optional, recurse into structs") {
    val table = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("s", StructType(Seq(StructField("a", FloatType))))))
    val incoming = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", DoubleType), StructField("b", StringType)))),
      StructField("fresh", StringType, nullable = false)))
    val evolved = SchemaEvolution.evolve(table, incoming).get
    assert(evolved("id").dataType === LongType)
    assert(evolved("id").nullable) // required + optional incoming ⇒ optional
    val s = evolved("s").dataType.asInstanceOf[StructType]
    assert(s("a").dataType === DoubleType)
    assert(s.fieldNames.contains("b"))
    assert(evolved("fresh").nullable) // added columns always optional
    // idempotent: evolving the evolved schema again is a no-op
    assert(SchemaEvolution.evolve(evolved, incoming).isEmpty)
  }

  test("evolution reaches structs inside list elements and map values (testMissingColumnDetection*Value)") {
    val table = StructType(Seq(
      StructField("lst", ArrayType(StructType(Seq(StructField("a", IntegerType))))),
      StructField("m", MapType(StringType, StructType(Seq(StructField("x", FloatType)))))))
    val incoming = StructType(Seq(
      StructField("lst", ArrayType(StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))),
      StructField("m", MapType(StringType, StructType(Seq(
        StructField("x", DoubleType), StructField("y", LongType)))))))
    val evolved = SchemaEvolution.evolve(table, incoming).get
    val lstEl = evolved("lst").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(lstEl("a").dataType === LongType) // widened inside list element
    assert(lstEl.fieldNames.contains("b")) // added inside list element
    val mVal = evolved("m").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType]
    assert(mVal("x").dataType === DoubleType)
    assert(mVal.fieldNames.contains("y"))
    // idempotent
    assert(SchemaEvolution.evolve(evolved, incoming).isEmpty)
  }

  test("normalize maps int8/16 to int (type-mapping parity)") {
    assert(SchemaEvolution.normalize(ByteType) === IntegerType)
    assert(SchemaEvolution.normalize(ShortType) === IntegerType)
  }
}

class AsofJoinSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof: most recent right at-or-before each left ts; nulls before any right") {
    val left = Seq((1L, "k", 10L), (2L, "k", 20L), (3L, "k", 5L), (4L, "other", 50L))
      .toDF("lid", "key", "ts")
    val right = Seq(("k", 8L, "a"), ("k", 10L, "b"), ("k", 15L, "c"))
      .toDF("key", "ts", "payload")
    val got = graft.operators.AsofJoin.asof(left, right, "key", "ts", Seq("payload"))
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("b")) // equal ts qualifies (<= semantics)
    assert(got(2L) === Some("c")) // latest at-or-before 20
    assert(got(3L) === None) // nothing at-or-before 5
    assert(got(4L) === None) // key with no right rows at all
  }

  test("asof forward: earliest right at-or-after each left ts") {
    val left = Seq((1L, "k", 10L), (2L, "k", 20L), (3L, "k", 5L), (4L, "k", 16L))
      .toDF("lid", "key", "ts")
    val right = Seq(("k", 8L, "a"), ("k", 10L, "b"), ("k", 15L, "c"))
      .toDF("key", "ts", "payload")
    val got = graft.operators.AsofJoin
      .asof(left, right, "key", "ts", Seq("payload"), direction = "forward")
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("b")) // equal ts qualifies (>= semantics)
    assert(got(2L) === None)      // nothing at-or-after 20
    assert(got(3L) === Some("a")) // earliest at-or-after 5
    assert(got(4L) === None)      // 16 > last right ts
  }

  test("asof tolerance: matches outside the band yield NULL payload") {
    val left = Seq((1L, "k", 10L), (2L, "k", 100L)).toDF("lid", "key", "ts")
    val right = Seq(("k", 8L, "a"), ("k", 15L, "c")).toDF("key", "ts", "payload")
    val back = graft.operators.AsofJoin
      .asof(left, right, "key", "ts", Seq("payload"), tolerance = Some(5L))
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(back(1L) === Some("a")) // gap 2 <= 5
    assert(back(2L) === None)      // gap 85 > 5 — match discarded, not the far row
    val fwd = graft.operators.AsofJoin
      .asof(left, right, "key", "ts", Seq("payload"), direction = "forward", tolerance = Some(5L))
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(fwd(1L) === Some("c")) // gap 5 <= 5 (inclusive band)
    assert(fwd(2L) === None)
    intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.asof(left, right, "key", "ts", Seq("payload"), direction = "sideways")
    }
  }

  test("asof tolerance works on TIMESTAMP ts columns (gap compared in epoch micros)") {
    // pre-fix: timestamp - timestamp is a DayTimeInterval, which cannot
    // compare to the Long tolerance — analysis failed the moment a
    // caller ADDED a tolerance to an otherwise-working timestamp as-of
    def ts(s: Long) = new java.sql.Timestamp(s)
    val left = Seq((1L, "k", ts(10000L)), (2L, "k", ts(100000L))).toDF("lid", "key", "ts")
    val right = Seq(("k", ts(8000L), "a"), ("k", ts(15000L), "c")).toDF("key", "ts", "payload")
    val got = graft.operators.AsofJoin
      .asof(left, right, "key", "ts", Seq("payload"), tolerance = Some(5000000L)) // 5 s in µs
      .select("lid", "payload").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("a")) // gap 2 s <= 5 s
    assert(got(2L) === None)      // gap 92 s > 5 s
  }

  test("sampling rates validate: negative/NaN rates fail loudly, not silently-empty") {
    val df = Seq((1L, "en"), (2L, "fr")).toDF("id", "lang")
    intercept[IllegalArgumentException](Sampling.hashSample(df, "id", rate = -0.1))
    intercept[IllegalArgumentException](Sampling.hashSample(df, "id", rate = Double.NaN))
    intercept[IllegalArgumentException](Sampling.hashSample(df, "id", rate = 1.5))
    intercept[IllegalArgumentException](
      Sampling.stratifiedHashSample(df, "id", "lang", Map("en" -> -0.5)))
    assert(Sampling.hashSample(df, "id", rate = 1.0).count() === 2L)
  }

  test("collectSorted rejects an outCol colliding with a key column") {
    val df = Seq(("k", 2L), ("k", 1L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      graft.operators.Skew.collectSorted(df, Seq("k"), "v", outCol = "k"))
    assert(e.getMessage.contains("collides"))
  }

  test("asof: rejects payload names that collide with left columns") {
    val l = Seq((1L, "k", 1L, "x")).toDF("lid", "key", "ts", "v")
    val r = Seq(("k", 1L, "y")).toDF("key", "ts", "v")
    intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.asof(l, r, "key", "ts", Seq("v"))
    }
  }
}

class SkewSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted collectSorted equals a direct sorted collect; salt spreads the hot key") {
    val df = ((1 to 500).map(i => ("hot", i.toLong)) ++ Seq(("cold", 900L), ("cold", 901L)))
      .toDF("k", "v")
    val got = graft.operators.Skew.collectSorted(df, Seq("k"), "v", "vs", saltBuckets = 8)
      .as[(String, Seq[Long])].collect().toMap
    assert(got("hot") === (1L to 500L))
    assert(got("cold") === Seq(900L, 901L))
    // the hot key's rows really spread: >1 distinct salt bucket
    val spread = df.filter($"k" === "hot")
      .select(graft.operators.Skew.salt(col("v"), 8)).distinct().count()
    assert(spread > 1, s"salt must spread a hot key, got $spread bucket(s)")
    // deterministic: same salt for the same value across evaluations
    assert(df.select(graft.operators.Skew.salt(col("v"), 8)).collect().toSeq ===
      df.select(graft.operators.Skew.salt(col("v"), 8)).collect().toSeq)
  }

  test("constant-value hot key still spreads and collects correctly") {
    // the worst case for a value-only salt: one hot key, ONE value —
    // spreadSalt must fan it out, and the result must still be exact
    val df = (1 to 400).map(_ => ("hot", 7L)).toDF("k", "v")
      .repartition(8) // monotonically_increasing_id varies within+across partitions
    val spread = df
      .withColumn("__s", graft.operators.Skew.spreadSalt(col("v"), 8))
      .select("__s").distinct().count()
    assert(spread > 1, s"spreadSalt must fan out a constant value, got $spread bucket(s)")
    val got = graft.operators.Skew.collectSorted(df, Seq("k"), "v", "vs", saltBuckets = 8)
      .as[(String, Seq[Long])].collect().toMap
    assert(got("hot") === Seq.fill(400)(7L))
  }

  test("collectSorted is retry-safe by default: salted frame is checkpointed (SPARK-23207)") {
    val df = (1 to 100).map(i => ("k", i.toLong)).toDF("k", "v")
    // default: the position-dependent salt is materialized via
    // localCheckpoint — the plan reads from a scanned RDD (lineage
    // truncated), so a stage retry replays stored salts, never
    // re-derives them
    val safe = graft.operators.Skew.collectSorted(df, Seq("k"), "v", "vs")
    def hasRddScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectLeaves().exists(_.nodeName.toLowerCase.contains("existingrdd")) ||
        p.toString.toLowerCase.contains("scan existingrdd")
    assert(hasRddScan(safe.queryExecution.executedPlan),
      s"expected checkpointed (ExistingRDD) scan in:\n${safe.queryExecution.executedPlan}")
    // opt-out keeps the pure lineage (no RDD scan leaf)
    val unsafe = graft.operators.Skew.collectSorted(df, Seq("k"), "v", "vs", retrySafe = false)
    assert(!hasRddScan(unsafe.queryExecution.executedPlan))
    // results identical either way
    assert(safe.as[(String, Seq[Long])].collect().toMap ===
      unsafe.as[(String, Seq[Long])].collect().toMap)
  }
}

class RangeJoinSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketized point-in-interval equals the naive BETWEEN join, once per match") {
    val points = Seq((1L, 3.0), (2L, 12.5), (3L, 25.0), (4L, 99.0)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 13.0), (20L, 12.0, 26.0), (30L, 24.0, 30.0)).toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 5.0)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    // naive reference: cross + filter
    val expect = points.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === expect)
    assert(got === Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (3L, 30L)))
  }

  test("an inverted interval (hi < lo) matches nothing instead of exploding") {
    // sequence(start, stop) defaults to step -1 when start > stop: pre-fix
    // one corrupt interval generated span/width junk candidate rows (or a
    // "too long sequence" crash for wide inversions)
    val points = Seq((1L, 3.0)).toDF("pid", "p")
    val ivs = Seq((10L, Some(0.0), Some(13.0)), (66L, Some(5.0), Some(-1.0e9)),
      (77L, Option.empty[Double], Option.empty[Double])).toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 5.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L)))
  }
}

class SessionizeBatchSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NULL timestamps are dropped, not seeded into spurious sessions") {
    // pre-fix: each null-ts row sorted first (ASC nulls first), started
    // its own null-bounded session, and shifted every real session's id
    val df = Seq(("k", Option.empty[Long]), ("k", Option.empty[Long]),
      ("k", Some(1000L)), ("k", Some(2000L))).toDF("user_id", "ts_us")
    val got = graft.operators.Sessionize.sessions(df, "user_id", "ts_us", gapUs = 500L)
      .orderBy("session_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("k", 0L, 1000L, 1000L, 1L), ("k", 1L, 2000L, 2000L, 1L)))
  }

  test("an input session_id (any case) fails loudly instead of being overwritten") {
    val collide = Seq(("k", 1000L, 9L)).toDF("user_id", "ts_us", "Session_Id")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sessionize.sessions(collide, "user_id", "ts_us")
    }
    assert(e.getMessage.contains("session_id"), s"unexpected: ${e.getMessage}")
  }
}

class AsofJoinSemanticsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof: a most-recent right row with a NULL field yields that NULL, not a stale carry") {
    // native ASOF JOIN semantics: the matched ROW's values, atomically
    val left = Seq((1L, "k", 20L)).toDF("lid", "key", "ts")
    val right = Seq(("k", 8L, Some(100L), Some(1.5)), ("k", 15L, Some(200L), None))
      .toDF("key", "ts", "pid", "pval")
    val r = graft.operators.AsofJoin.asof(left, right, "key", "ts", Seq("pid", "pval"))
      .select("pid", "pval").head()
    assert(r.getLong(0) === 200L) // the ts=15 row matched...
    assert(r.isNullAt(1)) // ...and its pval is NULL — no tearing from ts=8
  }

  test("asof: NULL keys and NULL right timestamps never match") {
    val left = Seq((1L, Option.empty[String], 20L), (2L, Some("k"), 20L))
      .toDF("lid", "key", "ts")
    val right = Seq((Option.empty[String], Some(8L), 100L), (Some("k"), None, 300L),
      (Some("k"), Some(5L), 400L)).toDF("key", "ts", "pid")
    val got = graft.operators.AsofJoin.asof(left, right, "key", "ts", Seq("pid"))
      .select("lid", "pid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === None) // NULL left key matches nothing
    assert(got(2L) === Some(400L)) // NULL-ts right row never matches; real one does
  }

  test("asof: a NULL LEFT timestamp never matches in either direction") {
    // forward's DESC ordering sorts NULL timestamps LAST — pre-fix, a
    // NULL-ts left row sat after every right row and carried the earliest
    // payload; backward (ASC, nulls first) masked the same hole by accident
    val left = Seq((1L, "k", Option.empty[Long]), (2L, "k", Some(9L)))
      .toDF("lid", "key", "ts")
    val right = Seq(("k", 8L, 100L), ("k", 10L, 200L), ("k", 15L, 300L))
      .toDF("key", "ts", "pid")
    for (dir <- Seq("backward", "forward")) {
      val got = graft.operators.AsofJoin.asof(left, right, "key", "ts", Seq("pid"),
        direction = dir)
        .select("lid", "pid").as[(Long, Option[Long])].collect().toMap
      assert(got(1L) === None, s"NULL left ts matched in direction=$dir")
      assert(got(2L) === Some(if (dir == "backward") 100L else 200L))
    }
  }
}
