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
    }
  }

  test("oracleSql covers every query (or is an intentional rows-only check)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.mkString(", ")}")
  }
}
