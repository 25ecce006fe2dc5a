package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by eval and generated code. */
object TextHashUtil {
  final val Mod: Long = (1L << 61) - 1 // Mersenne prime 2^61-1
  final val Base: Long = 257L

  /** Karp-Rabin polynomial rolling hash over UTF-8 bytes, mod 2^61-1.
    * Used for document fingerprinting: content-defined, incremental, and
    * cheap enough to run at scan speed.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // (h * 257 + b) mod (2^61-1) without BigInt: split the multiply
      h = mulMod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** (a*b) mod (2^61-1) for 0 <= a,b < 2^61 via 128-bit product and
    * Mersenne folding (2^64 ≡ 2^3 mod p).
    */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var t = (lo & Mod) + ((hi << 3) | (lo >>> 61))
    t = (t & Mod) + (t >>> 61)
    if (t >= Mod) t -= Mod
    t
  }

  /** FNV-1a 64-bit over UTF-8 bytes — the per-token hash for simhash. */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens: every token votes its hash
    * bits up/down; the sign of each position's tally forms the signature.
    * Near-duplicate texts differ in few bits (small Hamming distance).
    */
  def simHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        val h = fnv1a64(bytes, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  // the engine-wide RE2 \s contract (see WordShinglesUtil) — must match
  // the '[ \t\n\f\r]+' split in the simhash/fingerprint oracle SQL
  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\f' || b == '\r'

  /** The (a, b) universal-hash parameter sequence for MinHash permutations
    * — deterministic from `seed`, identical to drawing per-permutation
    * pairs from one `Random` stream.
    */
  def minhashParams(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      // two degenerate draws (each ~2^-61 per draw) need folding: abs of
      // Long.MinValue is STILL negative (a could land at -3, outside the
      // universal-hash family), and abs%Mod == Mod-1 would make a == Mod
      // ≡ 0 (mod p) — a CONSTANT permutation inflating every pairwise
      // similarity estimate by 1/k. floorMod folds the first; remapping
      // the second to 1 keeps a in [1, Mod-1]. Every non-degenerate draw
      // is bit-identical to the plain abs%Mod formulation, so existing
      // signatures/persisted indexes are unchanged.
      val a0 = math.floorMod(math.abs(rnd.nextLong()), Mod)
      as(i) = if (a0 == Mod - 1) 1L else a0 + 1
      bs(i) = math.floorMod(math.abs(rnd.nextLong()), Mod)
      i += 1
    }
    (as, bs)
  }

  /** All `k` permutation minima over one shingle-hash array in a single
    * fused loop. Arithmetic matches the column formulation exactly
    * (non-ANSI wrapping multiply/add, then pmod 2^61-1), so signatures are
    * bit-identical to k separate `array_min(transform(...))` columns —
    * which would run k passes over the array and allocate k intermediate
    * arrays per row.
    */
  def minhashSig(hashes: org.apache.spark.sql.catalyst.util.ArrayData,
      as: Array[Long], bs: Array[Long]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = hashes.numElements()
    val k = as.length
    if (n == 0) // array_min over an empty array is null, per permutation
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var sawValue = false
    var i = 0
    while (i < n) {
      // skip null slots like array_min does (reading one via getLong
      // would silently misinterpret the bytes); an ALL-null array yields
      // the same all-null signature as an empty one (array_min over
      // empty/all-null is null per permutation) — tracked by an explicit
      // flag, not a MaxValue sentinel compare, so a (theoretical) genuine
      // all-MaxValue minimum could never be misreported as null
      if (hashes.isNullAt(i)) { i += 1 }
      else {
      sawValue = true
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val x = h * as(j) + bs(j)
        var m = x % Mod
        if (m < 0) m += Mod
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
      }
    }
    if (!sawValue) // every slot was null
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](k))
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Rolling-hash document fingerprint as a codegen'd Catalyst expression. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextHashes.requireType(child, StringType, "rolling_hash")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** 64-bit SimHash signature as a codegen'd Catalyst expression. */
case class SimHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextHashes.requireType(child, StringType, "simhash64")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.simHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** MinHash signature (`array<long>` of `numHashes` permutation minima)
  * over a pre-hashed shingle array, fused into one codegen'd loop.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long) extends UnaryExpression {
  // construction-time, like HyperplaneSignatures' bits/tables: a negative
  // count (a computed bands·rows gone wrong) otherwise dies mid-job with
  // NegativeArraySizeException in the first executor task
  require(numHashes >= 1, s"minhash_signature: numHashes must be >= 1, got $numHashes")
  // analysis-time rejection: array<int> (or anything non-long) would make
  // getLong silently misread the element bytes into plausible garbage
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects array<bigint> shingle hashes, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  @transient private lazy val (as, bs) = TextHashUtil.minhashParams(numHashes, seed)

  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.minhashSig(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.minhashSig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object TextHashes {
  /** Shared analysis-time type gate: the SQL surface can pass anything,
    * and without this a wrong-typed argument failed at codegen/runtime
    * with an opaque per-row ClassCastException.
    */
  private[functions] def requireType(
      child: Expression, expected: DataType, fn: String): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == expected) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$fn expects ${expected.sql}, got ${child.dataType.sql}")

  def rolling_hash(c: Column): Column = GraftInternal.column(RollingHash(GraftInternal.expression(c)))
  def simhash64(c: Column): Column = GraftInternal.column(SimHash(GraftInternal.expression(c)))
  def minhash_signature(hashes: Column, numHashes: Int, seed: Long = 42): Column =
    GraftInternal.column(MinHashSig(GraftInternal.expression(hashes), numHashes, seed))
}
