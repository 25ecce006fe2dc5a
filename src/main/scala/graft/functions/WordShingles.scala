package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object WordShinglesUtil {
  /** Engine-wide whitespace contract: RE2's `\s` class — space, \t, \n,
    * \f, \r and NOTHING else. Deliberately NOT Java's `\s` (which adds
    * \x0B) and NOT `Character.isWhitespace` (which adds Unicode spaces
    * like U+2028): the DuckDB oracles tokenize with RE2 `\s`, and every
    * tokenizer in this engine (`TextAnalysis.tokens`, the BPE/punct
    * classes, `TextNormalize`, line-content tests) uses this exact set so
    * engine- and oracle-side tokenization agree byte for byte — \x0B and
    * Unicode spaces are word characters everywhere.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Distinct word n-gram shingles in one pass over the UTF-8 bytes.
    * Equivalent to split-on-\s+ → sliding(n) → join(" ") → distinct, but
    * without the per-index array slicing/allocation of the HOF
    * formulation (which dominated dedup runtime at 5k docs already).
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(str.charAt(i))) i += 1
      val st = i
      while (i < len && !isWs(str.charAt(i))) i += 1
      if (i > st) { starts.add(st); ends.add(i) }
    }
    val tokens = starts.size()
    if (tokens < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var t = 0
    while (t + n <= tokens) {
      // one shingle = the substring from token t's start to token
      // (t+n-1)'s end with interior whitespace runs normalized to ' '
      val sb = new java.lang.StringBuilder(ends.get(t + n - 1) - starts.get(t))
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(str, starts.get(t + k), ends.get(t + k))
        k += 1
      }
      seen.add(sb.toString)
      t += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingles as a codegen'd Catalyst expression. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    graft.functions.TextHashes.requireType(child, StringType, "word_shingles")
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    WordShinglesUtil.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesUtil.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column, n: Int): Column =
    GraftInternal.column(WordShingles(GraftInternal.expression(c), n))
}
