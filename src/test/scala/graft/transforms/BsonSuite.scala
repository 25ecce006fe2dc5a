package graft.transforms

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Wire-format assembly is done by hand here (no BSON library in this
  * environment — that absence is WHY graft.transforms.Bson exists), so
  * the decoder is tested against bytes built from the published spec,
  * not against itself.
  */
class BsonSuite extends AnyFunSuite {

  // ---- tiny spec-faithful BSON writer for fixtures ---------------------

  private class Doc {
    private val body = new ByteArrayOutputStream()
    private def w(bs: Array[Byte]): Unit = body.write(bs)
    private def cstr(s: String): Unit = { w(s.getBytes(StandardCharsets.UTF_8)); body.write(0) }
    private def i32(v: Int): Unit =
      w(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    private def i64(v: Long): Unit =
      w(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())
    private def str(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8); i32(b.length + 1); w(b); body.write(0)
    }
    def el(tpe: Int, name: String)(value: => Unit): Doc = {
      body.write(tpe); cstr(name); value; this
    }
    def double(n: String, v: Double): Doc = el(0x01, n) {
      i64(java.lang.Double.doubleToLongBits(v))
    }
    def string(n: String, v: String): Doc = el(0x02, n) { str(v) }
    def doc(n: String, d: Doc): Doc = el(0x03, n) { w(d.bytes) }
    def arr(n: String, d: Doc): Doc = el(0x04, n) { w(d.bytes) }
    def binary(n: String, sub: Int, b: Array[Byte]): Doc = el(0x05, n) {
      i32(b.length); body.write(sub); w(b)
    }
    def oid(n: String, hex: String): Doc = el(0x07, n) {
      w(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    }
    def bool(n: String, v: Boolean): Doc = el(0x08, n) { body.write(if (v) 1 else 0) }
    def date(n: String, ms: Long): Doc = el(0x09, n) { i64(ms) }
    def nul(n: String): Doc = el(0x0A, n) {}
    def regex(n: String, p: String, o: String): Doc = el(0x0B, n) { cstr(p); cstr(o) }
    def code(n: String, c: String): Doc = el(0x0D, n) { str(c) }
    def symbol(n: String, s: String): Doc = el(0x0E, n) { str(s) }
    def int32(n: String, v: Int): Doc = el(0x10, n) { i32(v) }
    def timestamp(n: String, t: Long, i: Long): Doc = el(0x11, n) {
      i32(i.toInt); i32(t.toInt)
    }
    def int64(n: String, v: Long): Doc = el(0x12, n) { i64(v) }
    def decimal128(n: String, lo: Long, hi: Long): Doc = el(0x13, n) { i64(lo); i64(hi) }
    def bytes: Array[Byte] = {
      val b = body.toByteArray
      ByteBuffer.allocate(b.length + 5).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(b.length + 5).put(b).put(0.toByte).array()
    }
  }

  test("scalar types decode to the reference's extended-JSON forms") {
    val d = new Doc()
      .string("name", "a\"b\nc")
      .int32("i", -7)
      .int64("small", 42L)
      .int64("big", (1L << 60) + 3)
      .double("pi", 3.5)
      .bool("ok", true)
      .nul("missing")
      .date("when", 1490716800000L)
      .oid("_id", "5f0c1a2b3c4d5e6f70819203")
      .timestamp("tsv", 1700000000L, 7L)
    val json = Bson.bsonToJson(d.bytes)
    assert(json.contains("\"name\":\"a\\\"b\\nc\""))
    assert(json.contains("\"i\":-7"))
    assert(json.contains("\"small\":42"))
    assert(json.contains("\"big\":{\"$numberLong\":\"" + ((1L << 60) + 3) + "\"}"))
    assert(json.contains("\"pi\":3.5"))
    assert(json.contains("\"ok\":true"))
    assert(json.contains("\"missing\":null"))
    assert(json.contains("\"when\":{\"$date\":1490716800000}"))
    assert(json.contains("\"_id\":{\"$oid\":\"5f0c1a2b3c4d5e6f70819203\"}"))
    assert(json.contains("\"tsv\":{\"$timestamp\":{\"t\":1700000000,\"i\":7}}"))
  }

  test("nested docs, arrays, binary, regex, code, symbol, decimal128") {
    val inner = new Doc().string("city", "Berlin").int32("zip", 10115)
    val arr = new Doc().int32("0", 1).int32("1", 2).int32("2", 3)
    val d = new Doc()
      .doc("addr", inner)
      .arr("xs", arr)
      .binary("blob", 0, Array[Byte](1, 2, 3))
      .regex("re", "^a.*b$", "i")
      .code("js", "f()")
      .symbol("sym", "sigil")
      // 1.25 = coefficient 125, exponent -2 → biased 6174: hi = 6174 << 49
      .decimal128("dec", 125L, 6174L << 49)
    val json = Bson.bsonToJson(d.bytes)
    assert(json.contains("\"addr\":{\"city\":\"Berlin\",\"zip\":10115}"))
    assert(json.contains("\"xs\":[1,2,3]"))
    assert(json.contains("\"blob\":{\"$binary\":{\"base64\":\"AQID\",\"subType\":\"00\"}}"))
    assert(json.contains(
      "\"re\":{\"$regularExpression\":{\"pattern\":\"^a.*b$\",\"options\":\"i\"}}"))
    assert(json.contains("\"js\":{\"$code\":\"f()\"}"))
    assert(json.contains("\"sym\":\"sigil\""))
    assert(json.contains("\"dec\":{\"$numberDecimal\":\"1.25\"}"))
  }

  test("legacy subtype-02 binary strips its nested length prefix; big integral doubles keep .0") {
    val payload = Array[Byte](1, 2, 3)
    val innerPrefixed = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(3).put(payload).array()
    val d = new Doc()
      .binary("legacy", 0x02, innerPrefixed) // binary-old: int32 inner length + bytes
      .binary("modern", 0x00, payload)
      .double("big", 1.23e7) // Double.toString uses E-notation at >= 1e7
    val json = Bson.bsonToJson(d.bytes)
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    // pre-fix the legacy payload carried 4 spurious leading length bytes
    assert(json.contains("\"base64\":\"" + b64 + "\",\"subType\":\"02\""))
    assert(json.contains("\"base64\":\"" + b64 + "\",\"subType\":\"00\""))
    // pre-fix: toPlainString dropped the '.0' and inference saw BIGINT
    assert(json.contains("\"big\":12300000.0"))
  }

  test("malformed input → null, never a throw (R6 poison path)") {
    assert(Bson.bsonToJson(null) === null)
    assert(Bson.bsonToJson(Array[Byte](1, 2)) === null)
    assert(Bson.bsonToJson(Array[Byte](99, 0, 0, 0, 1, 1, 1)) === null)
    // truncated mid-element
    val good = new Doc().string("a", "hello").bytes
    assert(Bson.bsonToJson(good.dropRight(4)) === null)
  }

  test("raw-BSON before/after feed the C8 flattener end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    def img(name: String, age: Int) =
      new Doc().oid("_id", "5f0c1a2b3c4d5e6f70819203").string("name", name)
        .int32("age", age).date("joined", 1490716800000L).bytes
    val rows = Seq(
      (null.asInstanceOf[Array[Byte]], img("ada", 36), "c", 1000L),
      (img("ada", 36), img("ada", 37), "u", 2000L)
    ).toDF("before_raw", "after_raw", "op", "ts_ms")
      .withColumn("source", struct(lit("db").as("db"), lit("people").as("collection")))
    val binary = rows
      .withColumnRenamed("before_raw", "before")
      .withColumnRenamed("after_raw", "after")
    val out = MongoDebezium.mongoDebeziumBinary()(binary)
      .select("_id", "name", "age", "_cdc.op")
      .as[(String, String, Long, String)].collect().toSet
    assert(out === Set(
      ("5f0c1a2b3c4d5e6f70819203", "ada", 36L, "I"),
      ("5f0c1a2b3c4d5e6f70819203", "ada", 37L, "U")))
  }

  test("binary partial update: BSON updatedFields patch-merges through the shared flattener") {
    val spark = TestSpark.spark
    import spark.implicits._
    def img(name: String, age: Int) =
      new Doc().string("name", name).int32("age", age).bytes
    val patch = new Doc().int32("age", 41).bytes
    val rows = Seq((img("bob", 40), null.asInstanceOf[Array[Byte]], patch, "u", 2000L))
      .toDF("before", "after", "upd_raw", "op", "ts_ms")
      .withColumn("updateDescription",
        struct(col("upd_raw").as("updatedFields"),
          array(lit("city")).as("removedFields")))
      .drop("upd_raw")
      .withColumn("source", struct(lit("db").as("db"), lit("people").as("collection")))
    val r = MongoDebezium.mongoDebeziumBinary()(rows)
      .select("name", "age", "_cdc.op").head()
    assert(r.getString(0) === "bob" && r.getLong(1) === 41L && r.getString(2) === "U")
  }
}
