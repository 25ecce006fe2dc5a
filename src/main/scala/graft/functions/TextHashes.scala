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

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'
}

/** Rolling-hash document fingerprint as a codegen'd Catalyst expression. */
case class RollingHash(child: Expression) extends UnaryExpression {
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
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHashUtil.simHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object TextHashes {
  def rolling_hash(c: Column): Column = GraftInternal.column(RollingHash(GraftInternal.expression(c)))
  def simhash64(c: Column): Column = GraftInternal.column(SimHash(GraftInternal.expression(c)))
}
