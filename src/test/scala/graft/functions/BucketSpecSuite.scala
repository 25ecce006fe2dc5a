package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-spec exactness: expected hash values are the published test
  * vectors from the Iceberg table spec, "Appendix B: 32-bit Hash
  * Requirements" (iceberg.apache.org/spec).
  */
class BucketSpecSuite extends AnyFunSuite {

  test("int/long 34 hashes to 2017239379 (ints and longs agree)") {
    assert(IcebergHashing.hashLong(34L) === 2017239379)
  }

  test("string 'iceberg' hashes to 1210000089") {
    assert(IcebergHashing.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
  }

  test("decimal 14.20 hashes to -500754589") {
    assert(IcebergHashing.hashDecimal(new java.math.BigDecimal("14.20")) === -500754589)
  }

  test("date 2017-11-16 hashes to -653330422") {
    val days = LocalDate.of(2017, 11, 16).toEpochDay
    assert(IcebergHashing.hashLong(days) === -653330422)
  }

  test("timestamp 2017-11-16T22:31:08 hashes to -2047944441") {
    val micros = LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(ZoneOffset.UTC).toEpochMilli * 1000L
    assert(IcebergHashing.hashLong(micros) === -2047944441)
  }

  test("binary 0x00010203 hashes to -188683207") {
    assert(IcebergHashing.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("bucket is (hash & MaxInt) % n") {
    assert(IcebergHashing.bucketLong(34L, 16) === (2017239379 & Int.MaxValue) % 16)
  }

  test("bucket expression evaluates and codegens over a DataFrame") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(34L, 0L, -1L, 12345L).toDF("v")
      .select(IcebergBucket(col("v"), 16).as("b"))
    val got = df.collect().map(_.getInt(0)).toSeq
    val exp = Seq(34L, 0L, -1L, 12345L).map(IcebergHashing.bucketLong(_, 16))
    assert(got === exp)
    // string + null safety
    val s = Seq(Some("iceberg"), None).toDF("s")
      .select(IcebergBucket(col("s"), 32).as("b"))
      .collect()
    assert(s(0).getInt(0) === IcebergHashing.bucketOf(1210000089, 32))
    assert(s(1).isNullAt(0))
  }

  test("an unsupported bucket source type fails at ANALYSIS, not mid-execution") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Iceberg's spec defines no float/double bucket; pre-fix this passed
    // analysis and died in the lazy kind match after tasks were scheduled
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.5).toDF("v").select(IcebergBucket(col("v"), 16)).collect()
    }
    assert(e.getMessage.contains("bucket"), s"unexpected: ${e.getMessage}")
  }
}
