package graft.transforms

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal BSON binary decoder — closes C8's raw-`BsonDocument` boundary.
  *
  * The reference consumes binary BSON through the Mongo Java driver and
  * dispatches on 13 value types (`MongoDataConverter.java:43-260`); this
  * container has no BSON library, so the engine carries its own decoder
  * for the published BSON wire format (little-endian, length-prefixed
  * documents of type-tagged elements). Output is Debezium-style
  * extended-JSON text, which [[MongoDebezium.unwrapExtendedJson]] already
  * normalizes into the typed pipeline — so a raw-BSON ingest is exactly
  * `bsonToJson` + the existing C8 flattener, with the same arm-for-arm
  * type dispatch as the reference:
  *
  *  - 0x01 double, 0x10 int32, 0x12 int64 → JSON numbers (int64 as
  *    `{"$numberLong":"…"}` above 2^53 to survive double round-trip)
  *  - 0x02 string, 0x0E symbol → JSON strings (symbol keeps its text)
  *  - 0x03 document / 0x04 array → nested JSON (arrays stay arrays;
  *    `array_handling_mode=document` is applied downstream)
  *  - 0x05 binary → `{"$binary":{"base64":…,"subType":…}}`
  *  - 0x07 ObjectId → `{"$oid":"…"}` (12 bytes hex)
  *  - 0x08 bool, 0x0A null / 0x06 undefined → JSON literal
  *  - 0x09 UTC datetime → `{"$date": epochMillis}`
  *  - 0x11 timestamp → `{"$timestamp":{"t":…,"i":…}}`
  *  - 0x0B regex → `{"$regularExpression":{"pattern":…,"options":…}}`
  *  - 0x0D javascript → `{"$code":"…"}`; 0x0F with-scope → code + scope
  *  - 0x13 decimal128 → `{"$numberDecimal":"…"}` (IEEE 754-2008 decimal,
  *    decoded without java.math loss for the 64-bit-coefficient range the
  *    connector domain produces)
  *  - 0x7F MaxKey / 0xFF MinKey → `{"$maxKey":1}` / `{"$minKey":1}`
  *
  * A malformed document yields null (the tombstone/poison path R6 already
  * handles) rather than failing the batch — matching the SMT contract.
  */
object Bson {

  /** Decode one BSON document to extended-JSON text; null/short input or
    * any structural violation → null.
    */
  def bsonToJson(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 5) null
    else
      try {
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val sb = new java.lang.StringBuilder(bytes.length * 2)
        readDocument(buf, sb, array = false)
        sb.toString
      } catch { case _: Exception => null }

  /** Column form: BINARY → extended-JSON STRING (null-safe). */
  val bsonToJsonUdf = udf(bsonToJson _)
  def bson_to_json(c: Column): Column = bsonToJsonUdf(c)

  // ---- wire-format reader ---------------------------------------------

  private def readDocument(buf: ByteBuffer, sb: java.lang.StringBuilder, array: Boolean): Unit = {
    val len = buf.getInt()
    if (len < 5) throw new IllegalArgumentException(s"bad doc length $len")
    val end = buf.position() + len - 5 // body ends before the trailing 0x00
    sb.append(if (array) '[' else '{')
    var first = true
    while (buf.position() < end) {
      val tpe = buf.get()
      val name = readCString(buf)
      if (!first) sb.append(',')
      first = false
      if (!array) { writeString(sb, name); sb.append(':') }
      readValue(tpe, buf, sb)
    }
    if (buf.get() != 0) throw new IllegalArgumentException("missing doc terminator")
    sb.append(if (array) ']' else '}')
  }

  private def readValue(tpe: Byte, buf: ByteBuffer, sb: java.lang.StringBuilder): Unit =
    tpe match {
      case 0x01 => // double
        val d = buf.getDouble()
        if (d.isNaN || d.isInfinite) writeString(sb, d.toString) else sb.append(jsonNum(d))
      case 0x02 => writeString(sb, readString(buf)) // string
      case 0x03 => readDocument(buf, sb, array = false)
      case 0x04 => readDocument(buf, sb, array = true)
      case 0x05 => // binary: int32 length, subtype byte, payload
        val n = buf.getInt(); val sub = buf.get() & 0xff
        val b0 = new Array[Byte](n); buf.get(b0)
        // legacy subtype 0x02 ("binary old") nests an extra int32 length
        // before the payload (BSON spec; the Mongo Java driver strips it)
        // — without stripping, 4 spurious little-endian length bytes lead
        // every decoded value
        val b =
          if (sub == 0x02 && n >= 4) java.util.Arrays.copyOfRange(b0, 4, n)
          else b0
        sb.append("{\"$binary\":{\"base64\":")
        writeString(sb, java.util.Base64.getEncoder.encodeToString(b))
        sb.append(",\"subType\":"); writeString(sb, f"$sub%02x"); sb.append("}}")
      case 0x06 => sb.append("null") // undefined (deprecated) → null
      case 0x07 => // ObjectId: 12 bytes
        val b = new Array[Byte](12); buf.get(b)
        sb.append("{\"$oid\":\"")
        b.foreach(x => sb.append(f"${x & 0xff}%02x"))
        sb.append("\"}")
      case 0x08 => sb.append(if (buf.get() != 0) "true" else "false")
      case 0x09 => sb.append("{\"$date\":").append(buf.getLong()).append('}')
      case 0x0A => sb.append("null")
      case 0x0B => // regex: two cstrings
        val pattern = readCString(buf); val options = readCString(buf)
        sb.append("{\"$regularExpression\":{\"pattern\":"); writeString(sb, pattern)
        sb.append(",\"options\":"); writeString(sb, options); sb.append("}}")
      case 0x0C => // DBPointer (deprecated): string + 12-byte oid → {$ref,$id}
        val ref = readString(buf); val b = new Array[Byte](12); buf.get(b)
        sb.append("{\"$ref\":"); writeString(sb, ref); sb.append(",\"$id\":\"")
        b.foreach(x => sb.append(f"${x & 0xff}%02x")); sb.append("\"}")
      case 0x0D => // javascript
        sb.append("{\"$code\":"); writeString(sb, readString(buf)); sb.append('}')
      case 0x0E => writeString(sb, readString(buf)) // symbol → its string
      case 0x0F => // code-with-scope: int32 total, string code, doc scope
        buf.getInt()
        sb.append("{\"$code\":"); writeString(sb, readString(buf))
        sb.append(",\"$scope\":"); readDocument(buf, sb, array = false); sb.append('}')
      case 0x10 => sb.append(buf.getInt())
      case 0x11 => // timestamp: low 4 = increment, high 4 = seconds
        val i = buf.getInt(); val t = buf.getInt()
        sb.append("{\"$timestamp\":{\"t\":").append(t.toLong & 0xffffffffL)
          .append(",\"i\":").append(i.toLong & 0xffffffffL).append("}}")
      case 0x12 => // int64: keep numeric while double-exact, else $numberLong
        val v = buf.getLong()
        if (v >= -(1L << 53) && v <= (1L << 53)) sb.append(v)
        else sb.append("{\"$numberLong\":\"").append(v).append("\"}")
      case 0x13 => // decimal128
        val lo = buf.getLong(); val hi = buf.getLong()
        sb.append("{\"$numberDecimal\":\""); sb.append(decimal128ToString(hi, lo))
        sb.append("\"}")
      case 0x7F => sb.append("{\"$maxKey\":1}")
      case -1   => sb.append("{\"$minKey\":1}") // 0xFF
      case other => throw new IllegalArgumentException(f"unknown BSON type 0x$other%02x")
    }

  /** JSON-escape and append a string literal. */
  private def writeString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'           => sb.append("\\\"")
        case '\\'          => sb.append("\\\\")
        case '\n'          => sb.append("\\n")
        case '\r'          => sb.append("\\r")
        case '\t'          => sb.append("\\t")
        case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
        case c             => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def readCString(buf: ByteBuffer): String = {
    val start = buf.position()
    var end = start
    while (buf.get(end) != 0) end += 1
    val b = new Array[Byte](end - start); buf.get(b)
    buf.get() // terminator
    new String(b, StandardCharsets.UTF_8)
  }

  private def readString(buf: ByteBuffer): String = {
    val n = buf.getInt() // includes trailing NUL
    if (n < 1) throw new IllegalArgumentException(s"bad string length $n")
    val b = new Array[Byte](n - 1); buf.get(b)
    if (buf.get() != 0) throw new IllegalArgumentException("missing string terminator")
    new String(b, StandardCharsets.UTF_8)
  }

  /** Render a double as JSON without the `.0`-dropping/engineering quirks
    * of Double.toString mattering downstream — from_json re-parses it, so
    * the default rendering is fine; integral values keep `.0` so inference
    * sees a double, matching the reference's DOUBLE arm.
    */
  private def jsonNum(d: Double): String = {
    val s = d.toString
    if (!s.contains('E')) s
    else {
      // toPlainString renders integral doubles (|d| >= 1e7 use E-notation)
      // WITHOUT a decimal point — "1.23E7" → "12300000" — which JSON
      // inference would type as BIGINT instead of DOUBLE; restore the
      // `.0` the contract above promises
      val p = new java.math.BigDecimal(d).toPlainString
      if (p.contains('.')) p else p + ".0"
    }
  }

  /** IEEE 754-2008 decimal128 (binary integer decimal encoding) → string.
    * Handles the full coefficient via 113-bit BigInt assembly; NaN/Inf and
    * the non-canonical (>34 digit) range render per the spec.
    */
  private def decimal128ToString(hi: Long, lo: Long): String = {
    val negative = (hi & 0x8000000000000000L) != 0
    val combination = ((hi >>> 58) & 0x1f).toInt
    if (combination == 0x1f) return "NaN"
    if (combination == 0x1e) return if (negative) "-Infinity" else "Infinity"
    // two forms: if bits 62-61 are 11, exponent takes bits 62-47 shifted,
    // coefficient gets implicit (8 + high bit); else standard form
    val (exponent, coefHi) =
      if ((hi & 0x6000000000000000L) == 0x6000000000000000L)
        ((((hi >>> 47) & 0x3fff).toInt), (hi & 0x00007fffffffffffL) | 0x0002000000000000L)
      else
        ((((hi >>> 49) & 0x3fff).toInt), hi & 0x0001ffffffffffffL)
    val exp = exponent - 6176
    val coeff = (BigInt(coefHi) << 64) | (BigInt(lo) & ((BigInt(1) << 64) - 1))
    // non-canonical: coefficient exceeding 34 digits means value 0
    val digits = if (coeff > BigInt("9999999999999999999999999999999999")) BigInt(0) else coeff
    val bd = new java.math.BigDecimal(digits.bigInteger, -exp)
    (if (negative) "-" else "") + bd.toPlainString
  }
}
