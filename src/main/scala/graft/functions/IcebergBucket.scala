package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Iceberg-exact `bucket(n, col)` partition transform as a native Catalyst
  * expression with whole-stage-codegen support (preferred over a Scala UDF:
  * stays inside WholeStageCodegen, null-handling for free).
  *
  * Semantics per the Iceberg spec: `(murmur3_x86_32(repr(v)) & MaxInt) % n`
  * with type-specific byte representations (see [[IcebergHashing]]).
  * Reference configures this via `iceberg.table.<t>.partition-by=bucket(c,n)`
  * (`data/SchemaUtils.createPartitionSpec:150-199`).
  */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "bucket count must be positive")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  // analysis-time rejection: without it an unsupported child type (a
  // DOUBLE partition column — Iceberg's spec has no float bucket) passed
  // analysis and died mid-execution in the lazy `kind` below, after
  // tasks were already scheduled
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
          StringType | BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg bucket transform is undefined for ${other.sql} " +
            "(spec: int/long/date/timestamp/string/binary/decimal)")
    }

  private lazy val kind: String = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType => "long"
    case StringType => "utf8"
    case BinaryType => "bytes"
    case _: DecimalType => "decimal"
    case other =>
      throw new IllegalArgumentException(s"bucket transform unsupported for $other")
  }

  override protected def nullSafeEval(input: Any): Any = kind match {
    case "long" =>
      IcebergHashing.bucketLong(input.asInstanceOf[Number].longValue(), n)
    case "utf8" =>
      IcebergHashing.bucketUTF8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    case "bytes" => IcebergHashing.bucketBytes(input.asInstanceOf[Array[Byte]], n)
    case "decimal" =>
      IcebergHashing.bucketDecimal(input.asInstanceOf[org.apache.spark.sql.types.Decimal], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = "graft.functions.IcebergHashing"
    kind match {
      case "long"    => defineCodeGen(ctx, ev, c => s"$h.bucketLong((long)$c, $n)")
      case "utf8"    => defineCodeGen(ctx, ev, c => s"$h.bucketUTF8($c, $n)")
      case "bytes"   => defineCodeGen(ctx, ev, c => s"$h.bucketBytes($c, $n)")
      case "decimal" => defineCodeGen(ctx, ev, c => s"$h.bucketDecimal($c, $n)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergBucket {
  def apply(c: Column, n: Int): Column =
    GraftInternal.column(IcebergBucket(GraftInternal.expression(c), n))
}
