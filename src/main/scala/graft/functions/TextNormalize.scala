package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup/quality pipelines: trim,
  * collapse whitespace runs to single spaces, lowercase, then Unicode NFC
  * — the composition `nfc(lower(collapse_ws(trim(text))))`, one pass per
  * row, expressible verbatim in standard SQL for oracle parity.
  *
  * Lowercasing uses `Locale.ROOT` DELIBERATELY: the result must be
  * deterministic regardless of the JVM's default locale (Spark's own
  * `lower()` falls back to default-locale mapping for non-ASCII, so a
  * tr/az/lt JVM would normalize 'İ' differently run to run — fatal for
  * a dedup key). The cost is a documented boundary: a handful of
  * full-case-mapping code points ('İ' → "i̇") may differ from an oracle
  * engine's simple case folding; corpora exercising them should compare
  * through the engine, not a locale-sensitive SQL `lower`.
  *
  * Normalizing BEFORE hashing/shingling makes exact and near dedup
  * insensitive to whitespace/case/encoding-form noise — without it the
  * same paragraph in NFC and NFD survives every exact-hash dedup pass.
  */
object TextNormUtil {
  def normalizeText(s: UTF8String): UTF8String = {
    // regex end-strip rather than String.trim: trim also eats control
    // chars (≤ U+0020) that `\s` does not, which would silently diverge
    // from the SQL formulation of the same pipeline. The class is RE2's
    // `\s` (no \x0B — Java's `\s` includes it, the RE2 oracles don't;
    // WordShinglesUtil documents the engine-wide contract).
    val collapsed = s.toString
      .replaceAll("^[ \\t\\n\\f\\r]+|[ \\t\\n\\f\\r]+$", "")
      .replaceAll("[ \\t\\n\\f\\r]+", " ")
      .toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(
      java.text.Normalizer.normalize(collapsed, java.text.Normalizer.Form.NFC))
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    graft.functions.TextHashes.requireType(child, StringType, "normalize_text")
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    TextNormUtil.normalizeText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormUtil.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object TextNormalize {
  def normalize_text(c: Column): Column =
    GraftInternal.column(NormalizeText(GraftInternal.expression(c)))
}
