package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mirrors the behavioral spec of the reference's conversion matrix
  * (`data/RecordConverterTest.java`, 835 lines): every target type from
  * every plausible source shape, plus name resolution modes.
  */
class CoercionSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(src: org.apache.spark.sql.DataFrame, target: StructType) =
    Coercion.project(src, target).head()

  test("numbers parse from strings and widen from numbers (C2)") {
    val src = Seq(("42", "3.5", 7, 1.25)).toDF("i_str", "d_str", "i", "d")
    val target = StructType(Seq(
      StructField("i_str", LongType), StructField("d_str", DoubleType),
      StructField("i", LongType), StructField("d", FloatType)))
    val r = one(src, target)
    assert(r.getLong(0) === 42L)
    assert(r.getDouble(1) === 3.5)
    assert(r.getLong(2) === 7L)
    assert(r.getFloat(3) === 1.25f)
  }

  test("decimal rescales HALF_UP (C3)") {
    val src = Seq(("14.255", 14.245)).toDF("s", "d")
    val target = StructType(Seq(
      StructField("s", DecimalType(10, 2)), StructField("d", DecimalType(10, 2))))
    val r = one(src, target)
    assert(r.getDecimal(0) === new java.math.BigDecimal("14.26"))
    // doubles round via their shortest string repr ("14.245" → 14.25 HALF_UP),
    // exactly the reference's BigDecimal.valueOf(double) path
    // (RecordConverter.convertDecimalValue:338-357)
    assert(r.getDecimal(1) === new java.math.BigDecimal("14.25"))
  }

  test("anything → string; complex types JSON-encoded (C4)") {
    val src = Seq((5, 1.5, true, Seq(1, 2), Map("a" -> 1)))
      .toDF("i", "d", "b", "arr", "m")
    val target = StructType(Seq("i", "d", "b", "arr", "m").map(StructField(_, StringType)))
    val r = one(src, target)
    assert(r.getString(0) === "5")
    assert(r.getString(1) === "1.5")
    assert(r.getString(2) === "true")
    assert(r.getString(3) === "[1,2]")
    assert(r.getString(4) === """{"a":1}""")
  }

  test("binary from base64 string (C5)") {
    val src = Seq(java.util.Base64.getEncoder.encodeToString("hi".getBytes)).toDF("b")
    val target = StructType(Seq(StructField("b", BinaryType)))
    assert(new String(one(src, target).getAs[Array[Byte]](0)) === "hi")
  }

  test("timestamps from epoch millis and lenient ISO strings (C6)") {
    val millis = 1684408953000L // 2023-05-18T11:22:33Z
    val src = Seq((
      millis,
      "2023-05-18T11:22:33Z",
      "2023-05-18 11:22:33",     // space separator repair
      "2023-05-18T11:22:33+0000" // +HHmm offset repair
    )).toDF("epoch", "iso", "space", "offset")
    val target = StructType(Seq("epoch", "iso", "space", "offset").map(StructField(_, TimestampType)))
    val r = one(src, target)
    (0 until 4).foreach { i =>
      assert(r.getTimestamp(i).getTime === millis, s"col $i")
    }
  }

  test("date from epoch days and ISO string (C6)") {
    val src = Seq((19495, "2023-05-18")).toDF("days", "str")
    val target = StructType(Seq(StructField("days", DateType), StructField("str", DateType)))
    val r = one(src, target)
    assert(r.getDate(0).toLocalDate === java.time.LocalDate.ofEpochDay(19495))
    assert(r.getDate(1).toLocalDate === java.time.LocalDate.of(2023, 5, 18))
  }

  test("nested struct conversion: case-insensitive resolution, missing → null, extra dropped (C1/R5)") {
    val src = spark.sql(
      "SELECT named_struct('ID', 1, 'Extra', 'x', 'val', '2.5') AS s")
    val target = StructType(Seq(StructField("s", StructType(Seq(
      StructField("id", LongType), StructField("val", DoubleType),
      StructField("missing", StringType))))))
    val r = one(src, target).getStruct(0)
    assert(r.getLong(0) === 1L)
    assert(r.getDouble(1) === 2.5)
    assert(r.isNullAt(2))
  }

  test("arrays and maps convert element-wise (C1)") {
    val src = Seq((Seq("1", "2"), Map("k" -> "3.5"))).toDF("arr", "m")
    val target = StructType(Seq(
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType))))
    val r = one(src, target)
    assert(r.getSeq[Long](0) === Seq(1L, 2L))
    assert(r.getMap[String, Double](1)("k") === 3.5)
  }

  test("JSON string → struct (schemaless path, C7)") {
    val src = Seq("""{"a": 1, "b": "x"}""").toDF("j")
    val target = StructType(Seq(StructField("j", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))))
    val r = one(src, target).getStruct(0)
    assert(r.getLong(0) === 1L && r.getString(1) === "x")
  }

  test("case-sensitive mode does not cross-match differently-cased fields (testCaseSensitivity)") {
    val src = Seq((7L, "x")).toDF("ID", "name")
    val target = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val insensitive = Coercion.project(src, target, caseInsensitive = true).head()
    assert(insensitive.getLong(0) === 7L)
    val sensitive = Coercion.project(src, target, caseInsensitive = false).head()
    assert(sensitive.isNullAt(0)) // "ID" must not resolve to "id"
    assert(sensitive.getString(1) === "x")
  }

  test("structs inside lists and maps convert element-wise (testStructValueInList/MapConvert)") {
    val src = spark.sql(
      """SELECT array(named_struct('a', '1', 'b', 2)) AS lst,
        |       map('k', named_struct('a', '3', 'b', 4)) AS m""".stripMargin)
    val inner = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val target = StructType(Seq(
      StructField("lst", ArrayType(inner)),
      StructField("m", MapType(StringType, inner))))
    val r = one(src, target)
    val e0 = r.getSeq[org.apache.spark.sql.Row](0).head
    assert(e0.getLong(0) === 1L && e0.getString(1) === "2")
    val mv = r.getMap[String, org.apache.spark.sql.Row](1)("k")
    assert(mv.getLong(0) === 3L && mv.getString(1) === "4")
  }

  test("timestamp-ntz from epoch millis and ISO string (testTimestampWithoutZoneConversion)") {
    val src = Seq((1700000000000L, "2023-11-15T07:51:30.888")).toDF("epoch", "iso")
    val target = StructType(Seq(
      StructField("epoch", TimestampNTZType), StructField("iso", TimestampNTZType)))
    val r = one(src, target)
    assert(r.getAs[java.time.LocalDateTime](0) ===
      java.time.LocalDateTime.ofEpochSecond(1700000000L, 0, java.time.ZoneOffset.UTC))
    assert(r.getAs[java.time.LocalDateTime](1) ===
      java.time.LocalDateTime.of(2023, 11, 15, 7, 51, 30, 888000000))
  }

  test("decimal from integer numbers (testDecimalConversion int arm)") {
    val src = Seq((123, 45L)).toDF("i", "l")
    val target = StructType(Seq(
      StructField("i", DecimalType(10, 2)), StructField("l", DecimalType(10, 2))))
    val r = one(src, target)
    assert(r.getDecimal(0) === new java.math.BigDecimal("123.00"))
    assert(r.getDecimal(1) === new java.math.BigDecimal("45.00"))
  }

  test("JSON string → array and map targets (schemaless path, C7)") {
    val src = Seq(("""[1, 2, 3]""", """{"a": 1, "b": 2}""")).toDF("arr", "m")
    val target = StructType(Seq(
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType))))
    val r = one(src, target)
    assert(r.getSeq[Long](0) === Seq(1L, 2L, 3L))
    assert(r.getMap[String, Long](1) === Map("a" -> 1L, "b" -> 2L))
  }

  test("map-key coercion that COLLIDES keys dedupes last-wins instead of crashing") {
    // "1" and "01" both cast to int 1 — transform_keys under the default
    // mapKeyDedupPolicy=EXCEPTION threw Spark's uncatchable duplicate-map-
    // key error (the same poison-record class as the null key); the
    // reference's Java converter fills a HashMap, where the LATER put
    // wins. "x" coerces to a null key and is dropped as before.
    val src = Seq((1L, Map("1" -> 10L, "01" -> 20L, "2" -> 30L, "x" -> 40L)))
      .toDF("id", "m")
    val target = StructType(Seq(StructField("id", LongType),
      StructField("m", MapType(IntegerType, LongType))))
    val r = one(src, target)
    assert(r.getMap[Int, Long](1) === Map(1 -> 20L, 2 -> 30L))
  }

  test("name-mapping aliases resolve source fields (E4)") {
    val src = Seq((7L, "x")).toDF("legacy_id", "name")
    val target = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val r = Coercion.project(src, target, nameMapping = Map("id" -> Seq("legacy_id"))).head()
    assert(r.getLong(0) === 7L)
  }

  test("Iceberg name-mapping JSON resolves by field id (RecordConverterTest.testNameMapping)") {
    import graft.schema.NameMapping
    val schema = StructType(Seq(StructField("ii", IntegerType), StructField("ff", FloatType)))
    // NameMapping.of(MappedField.of(1, ["renamed_ii"])) as NameMappingParser.toJson emits it
    val json = """[ { "field-id": 1, "names": ["renamed_ii"] } ]"""
    val mapping = NameMapping.parse(json, schema)
    assert(mapping === Map("ii" -> Seq("renamed_ii")))
    val src = Seq((123, 1.5f)).toDF("renamed_ii", "ff")
    val r = Coercion.project(src, schema, nameMapping = mapping).head()
    assert(r.getInt(0) === 123 && r.getFloat(1) === 1.5f)
  }

  test("name-mapping fresh-id assignment numbers direct fields before children") {
    import graft.schema.NameMapping
    val schema = StructType(Seq(
      StructField("a", IntegerType),
      StructField("s", StructType(Seq(StructField("x", IntegerType), StructField("y", IntegerType)))),
      StructField("b", StringType)))
    val json =
      """[ {"field-id": 1, "names": ["a_old"]},
        |  {"field-id": 2, "names": [], "fields": [
        |     {"field-id": 4, "names": ["x_old"]} ]},
        |  {"field-id": 3, "names": ["b_old", "b_older"]} ]""".stripMargin
    val mapping = NameMapping.parse(json, schema)
    assert(mapping === Map("a" -> Seq("a_old"), "s.x" -> Seq("x_old"),
      "b" -> Seq("b_old", "b_older")))
  }

  test("plain-object name-mapping form is accepted") {
    import graft.schema.NameMapping
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(NameMapping.parse("""{"id": ["legacy_id"]}""", schema) ===
      Map("id" -> Seq("legacy_id")))
  }

  test("unmatched target fields become null; extra source fields dropped (R5)") {
    val src = Seq((1L, "drop-me")).toDF("id", "extra")
    val target = StructType(Seq(StructField("id", LongType), StructField("absent", StringType)))
    val out = Coercion.project(src, target)
    assert(out.columns.toSeq === Seq("id", "absent"))
    assert(out.head().isNullAt(1))
  }

  test("EVERY numeric source is epoch MILLIS for timestamps (C6, incl. fractional)") {
    // the reference calls Number.longValue() on any numeric
    // (RecordConverter.java:407-495); a bare Spark cast would read
    // double/decimal as epoch SECONDS — 1000x off
    val target = StructType(Seq(StructField("ts", TimestampType)))
    val expect = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1490716800000L))
    for (src <- Seq(
        Seq(1490716800000.0).toDF("ts"), // double
        Seq(BigDecimal(1490716800000L)).toDF("ts"), // decimal
        Seq(1490716800000L).toDF("ts"))) { // long (control)
      val got = one(src, target).getTimestamp(0)
      assert(got === expect, s"epoch-millis mismatch for ${src.schema("ts").dataType}: $got")
    }
  }

  test("name-mapping fresh ids reserve slots for list elements and map keys/values") {
    import graft.schema.NameMapping
    // Iceberg: tags=1, user=2, tags.element=3, user.name=4 — skipping the
    // element id would bind field-id 4 to nothing and 3 to user.name
    val schema = StructType(Seq(
      StructField("tags", ArrayType(StringType)),
      StructField("user", StructType(Seq(StructField("name", StringType))))))
    val json = """[ {"field-id": 1, "names": ["labels"]},
                 |  {"field-id": 2, "names": [], "fields": [
                 |     {"field-id": 4, "names": ["username"]} ]} ]""".stripMargin
    assert(NameMapping.parse(json, schema) ===
      Map("tags" -> Seq("labels"), "user.name" -> Seq("username")))
    // and a map consumes key+value ids: m=1, after=2, m.key=3, m.value=4
    val schema2 = StructType(Seq(
      StructField("m", MapType(StringType, StringType)),
      StructField("after", LongType)))
    val json2 = """[ {"field-id": 2, "names": ["after_alias"]} ]"""
    assert(NameMapping.parse(json2, schema2) === Map("after" -> Seq("after_alias")))
  }

  test("strict mode fails the batch when a non-null value coerces to null") {
    // the reference's converters THROW on unconvertible values
    // (RecordConverter leaf converters); ANSI-off Spark nulls them —
    // strict mode restores the fail-loudly contract
    val target = StructType(Seq(StructField("n", IntegerType)))
    val bad = Seq("12", "not-a-number").toDF("n")
    val e = intercept[Exception] {
      Coercion.project(bad, target, strict = true).collect()
    }
    assert(e.getMessage.contains("strict coercion") && e.getMessage.contains("not-a-number"),
      s"unexpected error: ${e.getMessage}")
    // permissive default keeps the old behavior: null, no throw
    val permissive = Coercion.project(bad, target).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(permissive.toSet === Set(Some(12), None))
    // valid values and genuine source nulls pass strict untouched
    val ok = Seq(Some("7"), None).toDF("n")
    val got = Coercion.project(ok, target, strict = true).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSet === Set(Some(7), None))
  }

  test("violationReason names the bad column per ROW; nulls and clean rows pass") {
    import org.apache.spark.sql.functions.col
    val target = StructType(Seq(
      StructField("n", IntegerType), StructField("s", StringType)))
    val df = Seq(
      (Some("12"), "a"),   // clean
      (Some("bad"), "b"),  // n violates
      (None, "c")          // source null is not a violation
    ).toDF("n", "s")
    val reasons = df.select(Coercion.violationReason(df, target).as("r"), col("s"))
      .collect().map(r => (r.getString(1), Option(r.getString(0)))).toMap
    assert(reasons("a").isEmpty && reasons("c").isEmpty)
    assert(reasons("b").exists(m => m.contains("'n'") && m.contains("bad")))
    // a target with no resolvable columns is all-clean, not an error
    val none = StructType(Seq(StructField("zzz", IntegerType)))
    assert(df.select(Coercion.violationReason(df, none)).collect().forall(_.isNullAt(0)))
  }

  test("name-mapping aliases resolve at NESTED depth (RecordConverter every-lookup parity)") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    // Iceberg NameMappingParser form: fresh ids — root fields first
    // (id=1, s=2), then s's children (a=3)
    val nm = graft.schema.NameMapping.parse(
      """[{"field-id": 1, "names": ["id"]},
        | {"field-id": 2, "names": ["s"],
        |  "fields": [{"field-id": 3, "names": ["a", "legacy_a"]}]}]""".stripMargin,
      target)
    assert(nm.get("s.a").exists(_.contains("legacy_a")), s"parse lost the nested entry: $nm")
    val df = Seq((1L, 9L)).toDF("id", "x")
      .select(col("id"), struct(col("x").as("legacy_a")).as("s"))
    val got = Coercion.project(df, target, nameMapping = nm).collect()(0)
    // pre-fix the struct recursion passed Map.empty and null-filled s.a
    assert(got.getStruct(1).getLong(0) === 9L)
  }

  test("map-key coercion drops unconvertible keys (no runtime null-key crash) and flags the row") {
    val df = Seq(
      (1L, Map("7" -> "a", "abc" -> "b")), // "abc" key cannot become int
      (2L, Map("1" -> "x", "2" -> "y"))
    ).toDF("id", "m")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("m", MapType(IntegerType, StringType))))
    // permissive: the bad ENTRY drops (a null map key is unrepresentable —
    // Spark would throw "Cannot use null as map key"), good entries stay
    val got = Coercion.project(df, target).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getMap[Int, String](1).toMap)).toSeq
    assert(got === Seq((1L, Map(7 -> "a")), (2L, Map(1 -> "x", 2 -> "y"))))
    // the dead-letter filter CAN see the drop (previously this expression
    // itself crashed on the poison row)
    val reasons = df.orderBy("id")
      .select(col("id"), Coercion.violationReason(df, target).as("why"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(reasons(1L).exists(_.contains("'m'")))
    assert(reasons(2L).isEmpty)
    // strict mode fails the batch loudly on the same condition
    val e = intercept[Exception](
      Coercion.project(df, target, strict = true).collect())
    assert(e.getMessage != null)
  }

  test("schema-case-insensitive=false applies at NESTED depth too") {
    val df = Seq((1L, ("x", 5))).toDF("id", "s")
      .select(col("id"), col("s._1").as("NAME"), col("s._2").as("n"))
      .select(col("id"), struct(col("NAME"), col("n")).as("payload"))
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", StructType(Seq(
        StructField("name", StringType), StructField("n", IntegerType))))))
    val sensitive = Coercion.project(df, target, caseInsensitive = false).collect()(0)
    // nested NAME must NOT match name when the operator disabled
    // case-insensitive resolution — null-filled like a missing field
    assert(sensitive.getStruct(1).isNullAt(0))
    assert(sensitive.getStruct(1).getInt(1) === 5)
    val insensitive = Coercion.project(df, target, caseInsensitive = true).collect()(0)
    assert(insensitive.getStruct(1).getString(0) === "x")
  }

  test("a top-level source column whose NAME contains a dot projects correctly") {
    val df = Seq((1L, 7)).toDF("id", "user.id") // flattened-JSON shape
    val target = StructType(Seq(
      StructField("id", LongType), StructField("user.id", LongType)))
    val got = Coercion.project(df, target).collect()(0)
    assert(got.getLong(0) === 1L && got.getLong(1) === 7L)
    // and the violation filter parses it as one identifier too
    assert(df.select(Coercion.violationReason(df, target)).collect()(0).isNullAt(0))
  }

  test("DEEP nesting (r18): a 30-level struct coerces through the recursion — leaf " +
    "widened, a missing field at the deepest level nulled, every tag preserved") {
    // Debezium/Mongo envelopes nest aggressively; the coercion recursion
    // and its generated expression tree must survive real depth, not the
    // 2-3 levels the matrix tests use. 30 levels ≈ well past any sane
    // producer, well inside what must not StackOverflow.
    val depth = 30
    def deepType(n: Int, leaf: DataType, withMissing: Boolean): DataType =
      if (n == 0)
        StructType(
          StructField("leaf", leaf) +:
            (if (withMissing) Seq(StructField("added", StringType)) else Nil))
      else StructType(Seq(
        StructField("s", deepType(n - 1, leaf, withMissing)),
        StructField(s"tag$n", StringType)))
    def deepExpr(n: Int): String =
      if (n == 0) "named_struct('leaf', 41)"
      else s"named_struct('s', ${deepExpr(n - 1)}, 'tag$n', 't$n')"
    val src = spark.sql(s"SELECT 1L AS id, ${deepExpr(depth)} AS root")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("root", deepType(depth, LongType, withMissing = true))))
    val out = Coercion.project(src, target)
    assert(out.schema("root").dataType === target("root").dataType,
      "the full 30-level shape must land exactly")
    val path = "root." + Seq.fill(depth)("s").mkString(".")
    val r = out.select(
      col(s"$path.leaf"), col(s"$path.added"),
      col("root.tag30"), col(s"$path".split('.').take(depth).mkString(".") + ".tag1"))
      .head()
    assert(r.getLong(0) === 41L, "int leaf must widen to long through 30 levels")
    assert(r.isNullAt(1), "the missing deepest field must coerce to null")
    assert(r.getString(2) === "t30")
    assert(r.getString(3) === "t1")
  }
}
