package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.{EngineConfig, TableConfig}
import graft.sink.Ingest
import graft.table.{FilePruning, IceTable}

class ZOrderSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("column interleave matches the reference bit loop (2-D and 3-D)") {
    import spark.implicits._
    val samples = Seq(
      (0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (0xffffL, 0xffffL, 0xffffL), (12345L, 54321L, 7L),
      ((1L << 21) - 1, 0L, (1L << 21) - 1), (0x155555L, 0xaaaaaL, 0x33333L))
    val df = samples.toDF("a", "b", "c")
    val got2 = df.select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      .as[Long].collect().toSeq
    assert(got2 === samples.map { case (a, b, _) => ZOrder.interleaveRef2(a, b) })
    val got3 = df.select(ZOrder.interleave(Seq(col("a"), col("b"), col("c"))).as("z"))
      .as[Long].collect().toSeq
    assert(got3 === samples.map { case (a, b, c) => ZOrder.interleaveRef3(a, b, c) })
  }

  test("normalize rejects a bits budget past the interleave's sign-bit boundary") {
    // bits=32 in 2-D puts bit 31 at output bit 62; the +1-shifted
    // dimension lands it on the SIGN bit — negative z-values sorting the
    // top bucket first, silently destroying the clustering
    val e = intercept[IllegalArgumentException](ZOrder.normalize(col("x"), 0.0, 1.0, 32))
    assert(e.getMessage.contains("bits"), s"unexpected: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException](ZOrder.normalize(col("x"), 0.0, 1.0, 0))
    assert(e2.getMessage.contains("bits"), s"unexpected: ${e2.getMessage}")
  }

  test("normalize: NaN bounds fail loudly; NaN values clamp to the top bucket") {
    import org.apache.spark.sql.functions.col
    // a NaN bound (max() over a column containing NaN) silently zeroed
    // EVERY z-contribution pre-fix — the clustering the rewrite ran for
    // destroyed with no error anywhere
    intercept[IllegalArgumentException](ZOrder.normalize(col("x"), Double.NaN, 1.0, 8))
    intercept[IllegalArgumentException](ZOrder.normalize(col("x"), 0.0, Double.NaN, 8))
    // NaN VALUES land in the top bucket (where Spark's sort puts NaN)
    import spark.implicits._
    val got = Seq(0.0, 0.5, 1.0, Double.NaN).toDF("x")
      .select(ZOrder.normalize(col("x"), 0.0, 1.0, 8).as("b"))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 127L, 255L, 255L))
  }

  test("z-values preserve locality: normalize then interleave is monotone per dimension") {
    import spark.implicits._
    // along one axis with the other fixed, z must be non-decreasing
    val df = (0L until 1000L).toDF("x").select(
      ZOrder.interleave(Seq(
        ZOrder.normalize(col("x"), 0, 999, 10), lit(37L))).as("z"),
      col("x"))
    val zs = df.orderBy("x").select("z").as[Long].collect()
    assert(zs.zip(zs.tail).forall { case (a, b) => a <= b })
  }

  test("z-order rewrite prunes 2-D box scans where a 1-D sort cannot") {
    import spark.implicits._
    // two independent uniform dimensions — the adversarial case for 1-D
    // sorting (perfect u-bounds, useless v-bounds)
    val n = 40000
    val rows = (0 until n).map { i =>
      val u = (i * 2654435761L) % 1000 // pseudo-random, deterministic
      val v = (i * 40503L + 7) % 1000
      (i.toLong, u, v)
    }
    val df = rows.toDF("id", "u", "v")

    // (total files, files surviving a v-ONLY range pred, rows matching a
    // 2-D box through metadata pruning + the residual filter)
    def buildAndCount(zorder: Boolean): (Int, Int, Long) = {
      val wh = TestSpark.freshDir(if (zorder) "zorder-t" else "sorted-t")
      val cfg = EngineConfig(warehouse = wh, tables = Seq(TableConfig("t")), autoCreate = true)
      Ingest.run(spark, df, 0L, cfg)
      val t = IceTable.load(s"$wh/t")
      if (zorder) t.compactZOrder(spark, Seq("u", "v"), sortPartitions = 16)
      else t.compact(spark, sortBy = Seq("u"), sortPartitions = 16)
      t.gc(olderThanMs = 0L)
      val all = t.planFiles(None).size
      // the predicate constrains ONLY v — the dimension the 1-D layout
      // did not sort by. Its per-file v-bounds are ~the full domain
      // (every file holds all v values), so it can prune nothing; the
      // z-ordered files each cover a fraction of the v-domain.
      val prunedV = t.planFiles(None, filePred = Some(f =>
        FilePruning.mayContainRange(f, "v", Some("100"), Some("199")))).size
      val matched = t.scan(spark, None, filePred = Some(f =>
        FilePruning.mayContainRange(f, "u", Some("100"), Some("199")) &&
          FilePruning.mayContainRange(f, "v", Some("100"), Some("199"))))
        .filter(col("u").between(100, 199) && col("v").between(100, 199))
        .count()
      (all, prunedV, matched)
    }

    val (allZ, prunedZ, matchedZ) = buildAndCount(zorder = true)
    val (allS, prunedS, matchedS) = buildAndCount(zorder = false)
    // correctness: both layouts return every matching row
    val expected = rows.count { case (_, u, v) =>
      u >= 100 && u <= 199 && v >= 100 && v <= 199
    }.toLong
    assert(matchedZ === expected)
    assert(matchedS === expected)
    // v is 10% selective: the u-sorted layout's v-bounds cannot prune
    // (uniform independent v ⇒ every file spans ~the full v-domain),
    // while z-ordered files each cover a bounded v-slice. Margins are
    // loose because repartitionByRange samples boundaries randomly.
    assert(allZ >= 8, s"too few files to make pruning meaningful ($allZ)")
    assert(prunedZ * 2 <= allZ, s"z-order kept $prunedZ of $allZ files on a v-only range")
    assert(prunedS * 2 > allS, s"u-sorted layout implausibly pruned v: $prunedS of $allS")
    assert(prunedZ < prunedS,
      s"z-order ($prunedZ/$allZ) should out-prune 1-D sort ($prunedS/$allS) on the unsorted dim")
  }
}
