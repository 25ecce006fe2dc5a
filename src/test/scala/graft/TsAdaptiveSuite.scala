package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pin the schema-adaptive event-time helpers against every physical
  * representation the driver's testdata has shipped across regenerations:
  * epoch-nanos LONG (the original ns parquet under `nanosAsLong`),
  * TIMESTAMP_NTZ (Spark 4.1's resolution of isAdjustedToUTC=false
  * parquet), and session-zoned TIMESTAMP. All three must project to the
  * SAME epoch-micros; anything else must fail loudly at analysis time —
  * this is the guard the r7 environment drift showed was missing.
  */
class TsAdaptiveSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 2024-01-03 00:10:02.000003 UTC, as epoch micros
  private val us = 1704240602000003L

  test("tsMicros agrees across LONG(ns) / TIMESTAMP_NTZ / TIMESTAMP fixtures") {
    import spark.implicits._
    val base = Seq(us, us + 1000000L, us - 5L).toDF("us")

    // ns-long fixture: the legacy nanosAsLong shape
    val asLong = base.select((col("us") * 1000).as("ts"))
    // NTZ fixture: what this Spark resolves un-adjusted parquet timestamps to
    val asNtz = base.select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    // session-zoned fixture
    val asTz = base.select(timestamp_micros(col("us")).as("ts"))

    // parquet round-trip each so the test covers the real read path types
    for ((df, tag) <- Seq((asLong, "long"), (asNtz, "ntz"), (asTz, "tz"))) {
      val dir = TestSpark.freshDir(s"ts-fixture-$tag")
      df.write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
      val got = back.select(SparkEntry.tsMicros(back).as("us"))
        .orderBy("us").as[Long].collect().toSeq
      assert(got === Seq(us - 5L, us, us + 1000000L), s"fixture $tag")
      val gotTs = back.select(unix_micros(SparkEntry.tsTimestamp(back)).as("us"))
        .orderBy("us").as[Long].collect().toSeq
      assert(gotTs === Seq(us - 5L, us, us + 1000000L), s"fixture $tag (tsTimestamp)")
    }
  }

  test("tsMicros fails LOUDLY on an unhandled ts type") {
    import spark.implicits._
    val bad = Seq("2024-01-03").toDF("ts")
    val e = intercept[IllegalStateException] { SparkEntry.tsMicros(bad) }
    assert(e.getMessage.contains("parquet timestamp resolution"))
    val e2 = intercept[IllegalStateException] { SparkEntry.tsTimestamp(bad) }
    assert(e2.getMessage.contains("parquet timestamp resolution"))
  }

  test("the real events table resolves to a type the helpers handle") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dt = ev.schema("ts").dataType
    assert(dt == LongType || dt == TimestampNTZType || dt == TimestampType,
      s"events.ts drifted to $dt — extend SparkEntry.tsMicros before anything else")
    // and the projection is sane: all epochs within [2000, 2100)
    val range = ev.select(min(SparkEntry.tsMicros(ev)), max(SparkEntry.tsMicros(ev)))
      .collect()(0)
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    assert(lo > 946684800000000L && hi < 4102444800000000L,
      s"events.ts epoch-micros out of sane range: [$lo, $hi]")
  }
}
