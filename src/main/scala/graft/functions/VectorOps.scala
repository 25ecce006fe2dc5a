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
  // All kernels NULL-PROPAGATE on null elements (boxed return, null when
  // any element in the overlap is null) AND on length-mismatched inputs —
  // matching the zip_with/aggregate HOF formulation they are the fused
  // twin of (zip_with null-pads the shorter array, so a mismatched pair
  // aggregates to NULL, never to a silently-partial dot that could pass a
  // similarity threshold). Reading a null slot via
  // the primitive accessor would silently yield 0.0 (UnsafeArrayData) or
  // NPE (GenericArrayData): a wrong answer either way. The per-element
  // isNullAt is one bitset test; containsNull=false arrays pay only it.
  // `checked` is a plan-time constant (true only when either input's
  // schema says containsNull) — the generated call site passes a literal,
  // so the JIT dead-branch-eliminates the per-element null test on
  // proven-tight arrays and the fast loop stays as before.
  def dotDD(a: ArrayData, b: ArrayData, checked: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    if (checked) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getDouble(i) * b.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    java.lang.Double.valueOf(s)
  }

  def dotFF(a: ArrayData, b: ArrayData, checked: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    if (checked) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
      }
    } else {
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    }
    java.lang.Double.valueOf(s)
  }

  def dotFD(a: ArrayData, b: ArrayData, checked: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    if (checked) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += a.getFloat(i).toDouble * b.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    }
    java.lang.Double.valueOf(s)
  }

  def dotDF(a: ArrayData, b: ArrayData, checked: Boolean): java.lang.Double =
    dotFD(b, a, checked)

  /** All `tables` hyperplane-LSH signatures of `v` in ONE fused loop over
    * a flattened constant plane matrix (layout `[(t*bits+b)*dim + d]`).
    *
    * One expression node instead of tables×bits separate dot expressions:
    * a 64-table × 9-bit index as individual `ArrayDot`s is ~576 codegen
    * subtrees — past the JIT/codegen sweet spot and re-reading the vector
    * buffer per bit. Here the vector element loads amortize across all
    * planes and the generated code is a single static call.
    * Accumulation order per plane matches [[dotDD]], so signatures are
    * bit-identical to the per-bit formulation.
    */
  /** L2-normalize, norm computed ONCE ([[ArrayNormalize]]'s kernel).
    * Mirrors the HOF `transform(a, x => x / sqrt(dot(a,a)))` exactly:
    *  - any null element → dot is NULL → EVERY output slot null
    *  - zero norm → SQL x/0 → every slot null
    *  - NaN/Inf elements flow through the IEEE arithmetic unchanged
    *    (NaN norm → all-NaN; Inf norm → finite/Inf = 0.0, Inf/Inf = NaN)
    */
  def normalizeVec(v: ArrayData, floatElems: Boolean, checked: Boolean): ArrayData = {
    val n = v.numElements()
    if (n == 0) {
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Double](0))
    }
    var s = 0.0
    var i = 0
    var anyNull = false
    if (checked) {
      while (i < n && !anyNull) {
        if (v.isNullAt(i)) anyNull = true
        else { val x = if (floatElems) v.getFloat(i).toDouble else v.getDouble(i); s += x * x }
        i += 1
      }
    } else {
      if (floatElems) while (i < n) { val x = v.getFloat(i).toDouble; s += x * x; i += 1 }
      else while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    }
    val norm = math.sqrt(s)
    if (anyNull || norm == 0.0) {
      // all-null slots: SQL division by a NULL dot / a zero norm
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](n))
    }
    val out = new Array[Double](n)
    i = 0
    if (floatElems) while (i < n) { out(i) = v.getFloat(i).toDouble / norm; i += 1 }
    else while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def hyperplaneSigs(
      v: ArrayData,
      planes: Array[Double],
      bits: Int,
      tables: Int,
      dim: Int,
      floatElems: Boolean,
      checked: Boolean): ArrayData = {
    // a dimension-mismatched vector FAILS loudly (the hashBucket /
    // budgetSample contract discipline): silently zero-padding a short
    // vector or truncating a long one would hash it into arbitrary LSH
    // buckets with no signal, corrupting near-dup decisions for that row
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"hyperplane_signatures: vector has ${v.numElements()} elements but plane dim is $dim " +
          "— pass the corpus dimensionality as the dim argument")
    }
    val n = dim
    // null elements null the whole signature array (HOF-parity, same
    // contract as the dot kernels) — checked once, not per plane;
    // skipped entirely when the schema proves containsNull = false
    if (checked) {
      var chk = 0
      while (chk < n) { if (v.isNullAt(chk)) return null; chk += 1 }
    }
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var acc = 0.0
        var d = 0
        if (floatElems) {
          while (d < n) { acc += v.getFloat(d).toDouble * planes(base + d); d += 1 }
        } else {
          while (d < n) { acc += v.getDouble(d) * planes(base + d); d += 1 }
        }
        if (acc >= 0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sigs)
  }
}

/** dot(a, b) over array<float>/array<double> columns, null-safe,
  * codegen'd. Accumulates in double (same op order as the sequential HOF
  * formulation, so results are bit-identical to it).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // nullable beyond null INPUTS: a null ELEMENT nulls the result too
  override def nullable: Boolean = true

  // analysis-time rejection (the SQL surface can pass anything): without
  // it a wrong-typed argument failed at codegen/runtime with an opaque
  // ClassCastException per row instead of a clean AnalysisException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_dot expects array<float|double> arguments, got ${l.sql} and ${r.sql}")
    }

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

  private lazy val checkedElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dotDD" => VectorKernels.dotDD(x, y, checkedElems)
      case "dotFF" => VectorKernels.dotFF(x, y, checkedElems)
      case "dotFD" => VectorKernels.dotFD(x, y, checkedElems)
      case "dotDF" => VectorKernels.dotDF(x, y, checkedElems)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VectorKernels.$kernel($a, $b, $checkedElems);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** L2-normalize an array<float|double> vector to array<double> — the
  * fused twin of `transform(a, x => x / sqrt(dot(a, a)))`. That HOF form
  * re-evaluates the dot INSIDE the per-element lambda (subexpression
  * elimination does not reach lambda bodies), making normalization
  * O(d²) per row in the hottest path of every embedding operator; this
  * kernel computes the norm once — O(d) — with bit-identical results
  * (same sequential accumulation as [[ArrayDot]], same IEEE divide, and
  * the same SQL division semantics: any null element or a zero norm
  * nulls every output slot, NaN/Inf flow through the arithmetic).
  */
case class ArrayNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_normalize expects an array<float|double> vector, got ${other.sql}")
    }

  private lazy val floatElems =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val checkedElems =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.normalizeVec(a.asInstanceOf[ArrayData], floatElems, checkedElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorKernels.normalizeVec($c, $floatElems, $checkedElems);
    """)

  override protected def withNewChildInternal(c: Expression): ArrayNormalize = copy(child = c)
}

/** `array<long>` of `tables` hyperplane signatures for one vector — the
  * index-build kernel of the multi-table embedding LSH (see
  * [[graft.llm.Dedup.embeddingNearDupPairs]]). Plane matrix is generated
  * deterministically at plan time (table `t` draws `bits × dim` gaussians
  * from seed `baseSeed + t`, matching the single-signature formulation)
  * and rides into codegen as one referenced constant.
  */
case class HyperplaneSignatures(
    child: Expression,
    bits: Int,
    tables: Int,
    dim: Int,
    baseSeed: Long
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // '1L << b' wraps mod 64 on the JVM: bits 64+ would silently ALIAS
  // onto bits 0+, XOR-ing unrelated hyperplane decisions into the low
  // signature bits — wrong LSH buckets with no error anywhere (explicit
  // bits deliberately bypass the auto-sizing caps, so validate here)
  require(bits >= 1 && bits <= 64,
    s"hyperplane_signatures: bits must be in [1, 64], got $bits")
  require(tables >= 1, s"hyperplane_signatures: tables must be >= 1, got $tables")
  // dim 0 is the EmbIndex empty-build sentinel (safe: the eval-time
  // size-mismatch guard rejects every non-empty vector, and degenerate
  // empties are excluded upstream); NEGATIVE dim is only ever a caller
  // bug and would die lazily with NegativeArraySizeException
  require(dim >= 0, s"hyperplane_signatures: dim must be >= 0, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // nullable beyond a null INPUT: a null element nulls the signature array
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signatures expects an array<float|double> vector, got ${other.sql}")
    }

  @transient private lazy val planes: Array[Double] =
    HyperplaneSignatures.planeMatrix(bits, tables, dim, baseSeed)

  private lazy val floatElems =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case other =>
        throw new IllegalArgumentException(s"HyperplaneSignatures unsupported element type: $other")
    }

  private lazy val checkedElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.hyperplaneSigs(
      v.asInstanceOf[ArrayData], planes, bits, tables, dim, floatElems, checkedElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.VectorKernels.hyperplaneSigs($c, $ref, $bits, $tables, $dim, $floatElems, $checkedElems);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignatures =
    copy(child = c)
}

object HyperplaneSignatures {
  /** Flattened `[(t*bits+b)*dim + d]` plane matrix; per-table draws are
    * sequential gaussians from `baseSeed + t`, identical to building each
    * table's planes independently.
    */
  def planeMatrix(bits: Int, tables: Int, dim: Int, baseSeed: Long): Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(baseSeed + t)
      var i = 0
      while (i < bits * dim) { out(t * bits * dim + i) = rnd.nextGaussian(); i += 1 }
      t += 1
    }
    out
  }
}

object VectorOps {
  def array_dot(a: Column, b: Column): Column =
    GraftInternal.column(ArrayDot(GraftInternal.expression(a), GraftInternal.expression(b)))

  def array_normalize(v: Column): Column =
    GraftInternal.column(ArrayNormalize(GraftInternal.expression(v)))

  def hyperplane_signatures(
      v: Column, bits: Int, tables: Int, dim: Int = 64, baseSeed: Long = 7): Column =
    GraftInternal.column(
      HyperplaneSignatures(GraftInternal.expression(v), bits, tables, dim, baseSeed))
}
