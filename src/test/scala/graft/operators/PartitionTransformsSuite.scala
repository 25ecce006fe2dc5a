package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** P1 — partition-transform parsing + value derivation, mirroring
  * `SchemaUtilsTest` partition-spec cases and the Iceberg spec's truncate
  * semantics.
  */
class PartitionTransformsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("i", LongType), StructField("s", StringType),
    StructField("d", DecimalType(10, 2)), StructField("ts", TimestampType)))

  test("parse: bare name is identity; regex form matches the reference pattern") {
    assert(PartitionTransforms.parse("s", schema) ===
      PartitionTransforms.Identity("s"))
    assert(PartitionTransforms.parse("bucket(i,16)", schema) ===
      PartitionTransforms.Bucket("i", 16))
    assert(PartitionTransforms.parse("truncate(s,4)", schema) ===
      PartitionTransforms.Truncate("s", 4, StringType))
    assertThrows[IllegalArgumentException](PartitionTransforms.parse("cube(i)", schema))
  }

  test("parse validates the source column for EVERY transform (auto-create fallback contract)") {
    // Ingest's auto-create wraps parseSpec in try/catch to fall back to an
    // unpartitioned table (IcebergWriterFactory:69-117); a transform that
    // defers validation to write time would create a permanently broken
    // table instead
    for (spec <- Seq("missing", "identity(missing)", "year(missing)", "month(missing)",
        "day(missing)", "hour(missing)", "bucket(missing,4)", "truncate(missing,2)")) {
      assertThrows[IllegalArgumentException](PartitionTransforms.parse(spec, schema))
    }
  }

  test("truncate: integers floor to width multiple (incl. negatives), strings prefix, decimals floor unscaled") {
    val df = Seq(
      (17L, "abcdef", BigDecimal("14.25")),
      (-3L, "ab", BigDecimal("-0.05"))
    ).toDF("i", "s", "d").withColumn("d", col("d").cast(DecimalType(10, 2)))
    val out = df.select(
      PartitionTransforms.Truncate("i", 10, LongType).column(col("i")).as("ti"),
      PartitionTransforms.Truncate("s", 4, StringType).column(col("s")).as("ts"),
      PartitionTransforms.Truncate("d", 10, DecimalType(10, 2)).column(col("d")).as("td")
    ).collect()
    // Iceberg spec: floor semantics (negative values round toward -inf)
    assert(out(0).getLong(0) === 10L)
    assert(out(1).getLong(0) === -10L)
    assert(out(0).getString(1) === "abcd")
    assert(out(1).getString(1) === "ab")
    assert(out(0).getDecimal(2) === new java.math.BigDecimal("14.20"))
    assert(out(1).getDecimal(2) === new java.math.BigDecimal("-0.10"))
  }

  test("temporal transforms render Iceberg-style human-readable values") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-07 15:42:01")).toDF("ts")
    val specs = Seq("year(ts)", "month(ts)", "day(ts)", "hour(ts)")
    val cols = specs.map(s => PartitionTransforms.parse(s, schema))
      .map(t => t.column(col(t.source)).cast(StringType))
    val r = df.select(cols: _*).head()
    assert(r.getString(0) === "2024")
    assert(r.getString(1) === "2024-03")
    assert(r.getString(2) === "2024-03-07")
    assert(r.getString(3) === "2024-03-07-15")
  }

  test("parse rejects non-positive bucket/truncate arguments at CREATE time") {
    val schema = StructType(Seq(StructField("c", LongType)))
    // deferred to write time, bucket(c,0) fails every batch of an
    // already-created table; truncate(c,0) silently NULL-partitions
    for (bad <- Seq("bucket(c,0)", "bucket(c,-4)", "truncate(c,0)", "truncate(c,-1)")) {
      val e = intercept[IllegalArgumentException](PartitionTransforms.parse(bad, schema))
      assert(e.getMessage.contains("> 0"), s"spec '$bad' not rejected: ${e.getMessage}")
    }
    // a MISSING second argument names the broken token instead of dying
    // with a bare ArrayIndexOutOfBoundsException
    for (bad <- Seq("bucket(c)", "truncate(c)")) {
      val e = intercept[IllegalArgumentException](PartitionTransforms.parse(bad, schema))
      assert(e.getMessage.contains(bad), s"spec '$bad' not named: ${e.getMessage}")
    }
  }

  test("truncate: decimals past 18 digits floor exactly (no unscaled Long overflow)") {
    import org.apache.spark.sql.types.DecimalType
    val t = PartitionTransforms.parse("truncate(d,100)",
      StructType(Seq(StructField("d", DecimalType(38, 2)))))
    val big = new java.math.BigDecimal("12345678901234567890123.45") // unscaled >> Long.MaxValue
    val df = Seq(1).toDF("i").select(lit(big).cast(DecimalType(38, 2)).as("d"))
    val got = df.select(t.column(col("d")).cast("string")).head().getString(0)
    // floor to the width multiple of the unscaled value: ...890123.45 ->
    // width 100 (unscaled) = 1.00 at scale 2 -> ...890123.00
    assert(got === "12345678901234567890123.00",
      s"decimal truncate overflowed/nulled: $got")
  }
}
