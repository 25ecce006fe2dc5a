package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels for embedding math.
  *
  * The `aggregate(zip_with(...))` higher-order-function formulation
  * allocates an intermediate array per row-pair; at n² pair volume that
  * dominates ANN/near-dup runtime. This expression reads both ArrayData
  * buffers directly in one fused loop (primitive accessors, no
  * allocation) and participates in whole-stage codegen via a static
  * call.
  */
object VectorKernels {
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
}

/** dot(a, b) over array<float>/array<double> columns, null-safe,
  * codegen'd. Accumulates in double (same op order as the sequential HOF
  * formulation, so results are bit-identical to it).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private lazy val kernel: String = (elem(left), elem(right)) match {
    case (DoubleType, DoubleType) => "dotDD"
    case (FloatType, FloatType)   => "dotFF"
    case (FloatType, DoubleType)  => "dotFD"
    case (DoubleType, FloatType)  => "dotDF"
    case (l, r) =>
      throw new IllegalArgumentException(s"ArrayDot unsupported element types: $l, $r")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dotDD" => VectorKernels.dotDD(x, y)
      case "dotFF" => VectorKernels.dotFF(x, y)
      case "dotFD" => VectorKernels.dotFD(x, y)
      case "dotDF" => VectorKernels.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.$kernel($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

object VectorOps {
  def array_dot(a: Column, b: Column): Column =
    GraftInternal.column(ArrayDot(GraftInternal.expression(a), GraftInternal.expression(b)))
}
