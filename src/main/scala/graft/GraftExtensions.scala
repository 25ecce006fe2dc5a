package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions._

/** SQL-surface registration of the engine's custom Catalyst expressions,
  * the idiomatic extension point for operators Spark lacks:
  *
  * {{{
  *   val spark = SparkSession.builder()
  *     .withExtensions(new GraftExtensions) ...
  *   spark.sql("SELECT iceberg_bucket(16, id), rolling_hash(text) FROM t")
  * }}}
  *
  * Registered functions: `iceberg_bucket(n, col)` (spec-exact murmur3
  * partition transform), `rolling_hash(text)`, `simhash64(text)`,
  * `array_dot(a, b)`, `word_shingles(text, n)`,
  * `normalize_text(text)`, `minhash_signature(hashes, k)`,
  * `hyperplane_signatures(vec, bits, tables)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$fn expects a literal int, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "iceberg_bucket" -> (args => IcebergBucket(args(1), intArg(args.head, "iceberg_bucket"))),
    "rolling_hash" -> (args => RollingHash(args.head)),
    "simhash64" -> (args => SimHash(args.head)),
    "array_dot" -> (args => ArrayDot(args(0), args(1))),
    "word_shingles" -> (args => WordShingles(args.head, intArg(args(1), "word_shingles"))),
    "normalize_text" -> (args => NormalizeText(args.head)),
    "minhash_signature" -> (args =>
      MinHashSig(args.head, intArg(args(1), "minhash_signature"), seed = 42)),
    "hyperplane_signatures" -> (args =>
      // (vec, bits, tables[, dim]) — dim defaults to 64; vectors longer
      // than dim are signature-d on their first dim components
      HyperplaneSignatures(args.head,
        bits = intArg(args(1), "hyperplane_signatures"),
        tables = intArg(args(2), "hyperplane_signatures"),
        dim = if (args.length > 3) intArg(args(3), "hyperplane_signatures") else 64,
        baseSeed = 7))
  )

  /** Register on an already-created session (the builder-time
    * `withExtensions(new GraftExtensions)` path is preferred when you own
    * session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
