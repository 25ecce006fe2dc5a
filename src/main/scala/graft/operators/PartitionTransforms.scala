package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.IcebergBucket

/** P1 — Iceberg partition-transform parsing and column derivation.
  *
  * Parses the same `partition-by` strings as the reference
  * (`data/SchemaUtils.createPartitionSpec:150-199`, regex
  * `(\w+)\((.+)\)` at `SchemaUtils.java:44`): `identity` (bare column
  * name), `year(c)`, `month(c)`, `day(c)`, `hour(c)`, `bucket(c,n)`,
  * `truncate(c,w)`.
  *
  * Values are derived as Catalyst columns (codegen'd, evaluated at write
  * time) and become the table's physical partition layout via Spark's
  * native dynamic-partition fan-out writer (P2).
  */
sealed trait PartitionTransform {
  def source: String

  /** partition field name recorded in file metadata (Iceberg naming). */
  def fieldName: String

  /** column name used during the physical write (avoids clobbering the
    * source data column when `partitionBy` strips partition columns). */
  def writeName: String = s"__p_$fieldName"

  /** derived partition value (human-readable, Iceberg hive-layout style). */
  def column(in: Column): Column
}

object PartitionTransforms {
  final case class Identity(source: String) extends PartitionTransform {
    def fieldName: String = source
    def column(in: Column): Column = in
  }
  final case class Year(source: String) extends PartitionTransform {
    def fieldName: String = s"${source}_year"
    def column(in: Column): Column = year(in)
  }
  final case class Month(source: String) extends PartitionTransform {
    def fieldName: String = s"${source}_month"
    def column(in: Column): Column = date_format(in, "yyyy-MM")
  }
  final case class Day(source: String) extends PartitionTransform {
    def fieldName: String = s"${source}_day"
    def column(in: Column): Column = date_format(in, "yyyy-MM-dd")
  }
  final case class Hour(source: String) extends PartitionTransform {
    def fieldName: String = s"${source}_hour"
    def column(in: Column): Column = date_format(in, "yyyy-MM-dd-HH")
  }
  final case class Bucket(source: String, n: Int) extends PartitionTransform {
    def fieldName: String = s"${source}_bucket"
    def column(in: Column): Column = IcebergBucket(in, n)
  }

  /** Iceberg truncate: ints/longs floor to width multiple, strings take a
    * prefix, decimals floor the unscaled value (spec-exact).
    */
  final case class Truncate(source: String, width: Int, dt: DataType)
      extends PartitionTransform {
    def fieldName: String = s"${source}_trunc"
    def column(in: Column): Column = dt match {
      case IntegerType | LongType =>
        in - pmod(in, lit(width))
      case StringType => substring(in, 1, width)
      case d: DecimalType =>
        // Iceberg spec: floor the unscaled value to a width multiple —
        // expressed at the column's OWN scale (`in - pmod(in, width·10^-s)`,
        // pure decimal arithmetic). Materializing the unscaled value
        // through a Long cast would silently NULL values past 18 digits
        // (mis-partitioning with no error), and a double pow would corrupt
        // values whose scaled form isn't double-exact.
        val w = lit(java.math.BigDecimal.valueOf(width.toLong, d.scale))
        (in - pmod(in, w)).cast(d)
      case other =>
        throw new IllegalArgumentException(s"truncate unsupported for $other")
    }
  }

  private val TransformRegex = """(\w+)\((.+)\)""".r

  /** Parse one partition-by token against the table schema. EVERY
    * transform validates its source column at parse time — parseSpec is
    * the check behind Ingest's auto-create unpartitioned fallback
    * (IcebergWriterFactory:69-117); a transform that defers validation to
    * write time would let a broken spec through table creation and then
    * fail every batch forever.
    */
  def parse(token: String, schema: StructType): PartitionTransform = {
    def typeOf(c: String): DataType =
      schema.fields
        .find(_.name.equalsIgnoreCase(c))
        .map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(s"partition column $c not in schema"))
    def checked(c: String): String = { typeOf(c); c }
    token.trim match {
      case TransformRegex(fn, args) =>
        val parts = args.split(",").map(_.trim)
        // same loud-at-create contract as the n/w checks below: a missing
        // second argument (`bucket(c)`) must name the broken token, not
        // die with a bare ArrayIndexOutOfBoundsException
        def arg2: String = {
          require(parts.length >= 2,
            s"${fn.toLowerCase}(col, n) requires two arguments: $token")
          parts(1)
        }
        fn.toLowerCase match {
          case "identity" => Identity(checked(parts(0)))
          case "year"     => Year(checked(parts(0)))
          case "month"    => Month(checked(parts(0)))
          case "day"      => Day(checked(parts(0)))
          case "hour"     => Hour(checked(parts(0)))
          case "bucket" =>
            // argument validation happens HERE for the same reason source
            // columns validate here (doc above): bucket(c, 0) deferred to
            // write time fails every batch of an already-created table
            val n = arg2.toInt
            require(n > 0, s"bucket(n) requires n > 0: $token")
            Bucket(checked(parts(0)), n)
          case "truncate" =>
            val w = arg2.toInt
            // width 0 on an int/long column would not even fail loudly:
            // pmod(in, 0) is NULL non-ANSI, silently landing every row in
            // a NULL partition
            require(w > 0, s"truncate(w) requires w > 0: $token")
            Truncate(parts(0), w, typeOf(parts(0)))
          case other      => throw new IllegalArgumentException(s"unknown transform $other")
        }
      case bare => Identity(checked(bare))
    }
  }

  def parseSpec(spec: Seq[String], schema: StructType): Seq[PartitionTransform] =
    spec.map(parse(_, schema))
}
