package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSuite extends AnyFunSuite {

  test("custom expressions are callable from SQL once registered") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT iceberg_bucket(16, CAST(34 AS BIGINT)) AS b,
        |       rolling_hash('ab') AS rh,
        |       simhash64('hello world') AS sh,
        |       array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       size(word_shingles('a b c d', 3)) AS ws""".stripMargin).head()
    assert(r.getInt(0) === graft.functions.IcebergHashing.bucketLong(34L, 16))
    assert(r.getLong(1) === 97L * 257 + 98)
    assert(r.getDouble(3) === 11.0)
    assert(r.getInt(4) === 2)
  }

  test("curation expressions are callable from SQL once registered") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT normalize_text('  A  B ') AS nt,
        |       size(minhash_signature(array(CAST(7 AS BIGINT)), 8)) AS mh,
        |       size(hyperplane_signatures(array(1.0d, 0.5d), 5, 3)) AS hp""".stripMargin).head()
    assert(r.getString(0) === "a b")
    assert(r.getInt(1) === 8)
    assert(r.getInt(2) === 3)
  }
}
