package graft.transforms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mirrors `MongoDebeziumTransformTest` scenarios: insert/delete images,
  * partial-update reconstruction with removed fields.
  */
class MongoDebeziumSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("insert/delete images and partial-update reconstruction") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('c', CAST(NULL AS STRING), '{"_id": 1, "name": "ada", "age": 36}',
        |   CAST(NULL AS STRUCT<updatedFields: STRING, removedFields: ARRAY<STRING>>),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(1000 AS LONG)),
        |  ('u', '{"_id": 2, "name": "bob", "age": 40, "city": "nyc"}', CAST(NULL AS STRING),
        |   named_struct('updatedFields', '{"age": 41}', 'removedFields', array('city')),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(2000 AS LONG)),
        |  ('d', '{"_id": 3, "name": "eve", "age": 20}', CAST(NULL AS STRING),
        |   CAST(NULL AS STRUCT<updatedFields: STRING, removedFields: ARRAY<STRING>>),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(3000 AS LONG))
        |AS t(op, before, after, updateDescription, source, ts_ms)""".stripMargin)

    val out = MongoDebezium.mongoDebezium()(df)
      .select(col("_id"), col("name"), col("age"), col("city"),
        col("_cdc.op"), col("_cdc.source"))
      .orderBy("_id").collect()

    // insert: full after image
    assert(out(0).getLong(0) === 1L && out(0).getString(1) === "ada" && out(0).getString(4) === "I")
    // partial update: age patched, city removed, name carried from before
    assert(out(1).getLong(0) === 2L && out(1).getString(1) === "bob")
    assert(out(1).getLong(2) === 41L)
    assert(out(1).isNullAt(3))
    assert(out(1).getString(4) === "U")
    // delete: payload from before image
    assert(out(2).getLong(0) === 3L && out(2).getString(1) === "eve" && out(2).getString(4) === "D")
    assert(out(0).getString(5) === "appdb.users")
  }

  test("a field $set to null is NULLED, not resurrected from the before image") {
    // the reference's patch merge is KEY-PRESENCE based: updatedFields
    // carrying {"nickname": null} means the source database explicitly
    // nulled the field — pre-fix coalesce(upd.f, before.f) silently kept
    // the old value
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('u', '{"_id": 7, "name": "zoe", "nickname": "zz"}', CAST(NULL AS STRING),
        |   named_struct('updatedFields', '{"nickname": null}',
        |     'removedFields', CAST(NULL AS ARRAY<STRING>)),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(1000 AS LONG))
        |AS t(op, before, after, updateDescription, source, ts_ms)""".stripMargin)
    val out = MongoDebezium.mongoDebezium()(df)
      .select(col("_id"), col("name"), col("nickname")).head()
    assert(out.getLong(0) === 7L && out.getString(1) === "zoe")
    assert(out.isNullAt(2), "explicitly-nulled field resurrected from the before image")
  }

  test("$binary unwraps in either key order (JSON writers do not guarantee one)") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('c', CAST(NULL AS STRING),
        |   '{"_id": 1, "b1": {"$binary":{"base64":"AQI=","subType":"00"}}, "b2": {"$binary":{"subType":"00","base64":"AwQ="}}}',
        |   CAST(NULL AS STRUCT<updatedFields: STRING, removedFields: ARRAY<STRING>>),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(1000 AS LONG))
        |AS t(op, before, after, updateDescription, source, ts_ms)""".stripMargin)
    val out = MongoDebezium.mongoDebezium()(df).select(col("b1"), col("b2")).head()
    assert(out.getString(0) === "AQI=")
    assert(out.getString(1) === "AwQ=", "subType-first $binary stayed wrapped")
  }

  test("extended-JSON scalars unwrap to typed values (shouldConvertCreateEvents golden)") {
    // after-image is the reference's mongo_create_event_after.json fixture
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('c', CAST(NULL AS STRING),
        |   '{"_id" : {"$numberLong" : "1004"},"first_name" : "Anne","last_name" : "Kretchmar","email" : "annek@noanswer.org"}',
        |   named_struct('db', 'appdb', 'collection', 'customers'), CAST(1000 AS LONG))
        |AS t(op, before, after, source, ts_ms)""".stripMargin)
    val r = MongoDebezium.mongoDebezium()(df)
      .select("_id", "first_name", "last_name", "email").head()
    // MongoDataConverter INT64 arm: $numberLong "1004" → 1004L
    assert(r.getLong(0) === 1004L)
    assert(r.getString(1) === "Anne" && r.getString(2) === "Kretchmar")
    assert(r.getString(3) === "annek@noanswer.org")
  }

  test("$timestamp and $binary wrappers unwrap (TIMESTAMP/BINARY arms)") {
    val doc = """{"_id": 1, "ts": {"$timestamp": {"t": 1490716800, "i": 7}},
                 | "blob": {"$binary": {"base64": "aGVsbG8=", "subType": "00"}},
                 | "legacy": {"$binary": "d29ybGQ=", "$type": "00"}}"""
      .stripMargin.replace("\n", "")
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  ('c', CAST(NULL AS STRING), '$doc',
         |   named_struct('db', 'appdb', 'collection', 'blobs'), CAST(1000 AS LONG))
         |AS t(op, before, after, source, ts_ms)""".stripMargin)
    val r = MongoDebezium.mongoDebezium()(df)
      .select("_id", "ts", "blob", "legacy").head()
    assert(r.getLong(1) === 1490716800000L) // seconds*1000 (reference TIMESTAMP arm)
    assert(r.getString(2) === "aGVsbG8=") // base64 payload; C5 decodes at the table
    assert(r.getString(3) === "d29ybGQ=")
  }

  test("$oid, $date, $numberInt, $numberDecimal and $numberDouble wrappers unwrap") {
    val doc = """{"_id": {"$oid": "635019a078be67426d7cf4d2"},
                 | "created": {"$date": 1490716800000},
                 | "updated": {"$date": "2023-01-15T10:30:00Z"},
                 | "count": {"$numberInt": "42"},
                 | "ratio": {"$numberDouble": "-2.5e3"},
                 | "price": {"$numberDecimal": "19.99"}}""".stripMargin.replace("\n", "")
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  ('c', CAST(NULL AS STRING), '$doc',
         |   named_struct('db', 'appdb', 'collection', 'orders'), CAST(1000 AS LONG))
         |AS t(op, before, after, source, ts_ms)""".stripMargin)
    val r = MongoDebezium.mongoDebezium()(df)
      .select("_id", "created", "updated", "count", "ratio", "price").head()
    assert(r.getString(0) === "635019a078be67426d7cf4d2") // OBJECT_ID arm → string
    assert(r.getLong(1) === 1490716800000L) // DATE_TIME numeric → epoch millis (C6 coerces)
    assert(r.getString(2) === "2023-01-15T10:30:00Z") // ISO form stays a parseable string
    assert(r.getLong(3) === 42L) // INT32 arm (long under JSON inference)
    assert(r.getDouble(4) === -2500.0) // DOUBLE arm (canonical $numberDouble)
    assert(r.getDouble(5) === 19.99) // DECIMAL128 arm (double in the JSON domain)
  }

  test("negative-exponent decimals and t=0 timestamps unwrap (Decimal128 E-notation, initial-sync)") {
    val doc = """{"_id": 1, "tiny": {"$numberDecimal": "2.5E-7"},
                 | "sync_ts": {"$timestamp": {"t": 0, "i": 1}}}"""
      .stripMargin.replace("\n", "")
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  ('c', CAST(NULL AS STRING), '$doc',
         |   named_struct('db', 'appdb', 'collection', 'x'), CAST(1000 AS LONG))
         |AS t(op, before, after, source, ts_ms)""".stripMargin)
    val r = MongoDebezium.mongoDebezium()(df).select("_id", "tiny", "sync_ts").head()
    // pre-fix: the decimal char class lacked '-' (wrapper survived as a
    // struct), and t=0 appended to the invalid token 0000, nulling the
    // whole document under Jackson's leading-zero rule
    assert(r.getLong(0) === 1L)
    assert(r.getDouble(1) === 2.5e-7)
    assert(r.getLong(2) === 0L)
  }

  test("$code, $regularExpression/$regex and $symbol wrappers unwrap (residual BSON arms)") {
    val doc = """{"_id": 1,
                 | "js": {"$code": "var x = 1"},
                 | "jss": {"$code": "f()", "$scope": {"a": 5}},
                 | "pat": {"$regularExpression": {"pattern": "^a.*b", "options": "i"}},
                 | "legacy": {"$regex": "x+", "$options": "m"},
                 | "sym": {"$symbol": "sss"}}""".stripMargin.replace("\n", "")
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  ('c', CAST(NULL AS STRING), '$doc',
         |   named_struct('db', 'appdb', 'collection', 'misc'), CAST(1000 AS LONG))
         |AS t(op, before, after, source, ts_ms)""".stripMargin)
    val r = MongoDebezium.mongoDebezium()(df)
      .selectExpr("js", "jss.code", "jss.scope.a", "pat.regex", "pat.options",
        "legacy.regex", "legacy.options", "sym")
      .head()
    assert(r.getString(0) === "var x = 1") // JAVASCRIPT arm → code string
    assert(r.getString(1) === "f()" && r.getLong(2) === 5L) // JAVASCRIPT_WITH_SCOPE struct
    assert(r.getString(3) === "^a.*b" && r.getString(4) === "i") // REGULAR_EXPRESSION struct
    assert(r.getString(5) === "x+" && r.getString(6) === "m") // legacy pair form
    assert(r.getString(7) === "sss") // SYMBOL → string (upstream Debezium semantics)
  }

  test("array_handling_mode=document encodes arrays as _N documents (ArrayEncoding.DOCUMENT)") {
    val doc = """{"_id": 1, "tags": ["a", "b"], "mixed": [7, "x"], "nested": [[1, 2], [3]]}"""
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  ('c', CAST(NULL AS STRING), '$doc',
         |   named_struct('db', 'appdb', 'collection', 'arr'), CAST(1000 AS LONG))
         |AS t(op, before, after, source, ts_ms)""".stripMargin)
    val r = MongoDebezium.mongoDebezium(arrayHandlingMode = "document")(df)
      .selectExpr("tags._0", "tags._1", "mixed._0", "mixed._1",
        "nested._0._0", "nested._0._1", "nested._1._0")
      .head()
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    // document mode's point: heterogeneous elements keep their own types
    assert(r.getLong(2) === 7L && r.getString(3) === "x")
    assert(r.getLong(4) === 1L && r.getLong(5) === 2L && r.getLong(6) === 3L)
    // default mode still yields a real array
    val arr = MongoDebezium.mongoDebezium()(df).select("tags").head().getSeq[String](0)
    assert(arr === Seq("a", "b"))
  }
}
