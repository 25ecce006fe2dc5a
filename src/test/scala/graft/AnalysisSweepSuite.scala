package graft

import org.scalatest.funsuite.AnyFunSuite

/** Analysis sweep: every SparkEntry query must ANALYZE against sf0.001.
  *
  * Spark analyzes DataFrames eagerly at construction, so building each
  * query and touching `queryExecution.analyzed` catches unresolved
  * columns, type mismatches, and schema drift in the testdata (the r7
  * failure class: `ts` silently re-resolving as TIMESTAMP_NTZ broke 11
  * queries at analysis time while every unit test stayed green) without
  * paying for execution. Queries whose builder function itself executes
  * work (ingest/streaming entries) still do that work — acceptable: those
  * were the hardest-hit queries and MUST be in the sweep.
  *
  * One registered test per query so a failure names its query directly.
  */
class AnalysisSweepSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"analyzes: $name") {
      val df = fn(spark, sfDir)
      assert(df.queryExecution.analyzed != null)
      assert(df.schema.nonEmpty, s"$name produced an empty schema")
      // driver-comparability lint: the pandas oracle comparator throws
      // "unhashable type" on array/map/struct cells before comparing
      // anything (the r8 agg_collect failure class) — every contract
      // output must be scalar-columned
      val nested = Verify.nestedTopLevelCols(df.schema)
      assert(nested.isEmpty,
        s"$name outputs non-scalar top-level column(s) ${nested.mkString(", ")} — " +
          "serialize them (concat_ws/to_json) in the final projection")
    }
  }

  test("oracleSql covers every query (or is an intentional rows-only check)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.mkString(", ")}")
  }

  test("the nested-output lint actually fires on an array column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bad = Seq((1L, "a")).toDF("id", "s")
      .groupBy("id").agg(collect_list("s").as("vals"))
    assert(Verify.nestedTopLevelCols(bad.schema) === Seq("vals"))
    val good = bad.withColumn("vals", concat_ws(",", col("vals")))
    assert(Verify.nestedTopLevelCols(good.schema).isEmpty)
  }
}
