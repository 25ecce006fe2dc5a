package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TextHashesSuite extends AnyFunSuite {

  test("rolling hash is the Karp-Rabin polynomial mod 2^61-1") {
    // "ab" = (0*257 + 97)*257 + 98 = 97*257 + 98
    assert(TextHashUtil.rollingHash(UTF8String.fromString("ab")) === 97L * 257 + 98)
    assert(TextHashUtil.rollingHash(UTF8String.fromString("")) === 0L)
    // deterministic and content-sensitive
    val a = TextHashUtil.rollingHash(UTF8String.fromString("hello world"))
    val b = TextHashUtil.rollingHash(UTF8String.fromString("hello worle"))
    assert(a !== b)
    assert(a === TextHashUtil.rollingHash(UTF8String.fromString("hello world")))
  }

  test("rolling hash stays within the modulus on long input") {
    val long = "x" * 100000
    val h = TextHashUtil.rollingHash(UTF8String.fromString(long))
    assert(h >= 0L && h < (1L << 61) - 1)
  }

  test("simhash: near-duplicate texts are closer in Hamming distance than unrelated texts") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy cat again and again today"
    val far = "completely unrelated words about spark catalyst optimizer internals rule"
    val hBase = TextHashUtil.simHash64(UTF8String.fromString(base))
    val hNear = TextHashUtil.simHash64(UTF8String.fromString(near))
    val hFar = TextHashUtil.simHash64(UTF8String.fromString(far))
    assert(ham(hBase, hNear) < ham(hBase, hFar))
  }

  test("expressions evaluate over a DataFrame (codegen path)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq("ab", "hello world").toDF("t")
      .select(TextHashes.rolling_hash(col("t")).as("rh"), TextHashes.simhash64(col("t")).as("sh"))
      .collect()
    assert(rows(0).getLong(0) === 97L * 257 + 98)
    assert(rows(1).getLong(0) === TextHashUtil.rollingHash(UTF8String.fromString("hello world")))
  }
}
