package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus: exact-token term frequencies
  * scored with BM25 (Robertson/Spärck Jones; the `k1`/`b` form used by
  * Lucene and every modern search stack).
  *
  * 100 TB shape: term/corpus statistics (document frequency per query
  * term, N, average doc length) are ONE partial-aggregated reduction to a
  * single driver row per query — index-build-sized, embedded back into
  * the scoring expression as literals — so scoring is a pure map-side
  * codegen'd pass over the corpus scan followed by a top-k
  * (`TakeOrderedAndProject`, never a full sort). Nothing shuffles except
  * k rows per partition.
  */
object Search {

  /** Occurrences of `term` as a whole whitespace-delimited token. */
  def termFrequency(text: Column, term: String): Column =
    size(filter(TextAnalysis.tokens(text), t => t === lit(term)))

  /** BM25 top-k: the `k` highest-scoring docs for `terms`, scored in
    * fixed-point micro-units (`bm25_fixed = round(score * 1e6)` — the
    * cross-engine-exact exchange form used throughout the oracle
    * contract) with ranking on (bm25_fixed desc, id asc) so the top-k
    * boundary is deterministic. Returns (id, bm25_fixed, rank).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val text = col(textCol)
    // one reduction for every statistic the scorer needs: N, avgdl, and
    // per-term document frequency
    // avgdl from an exact integer token sum (order-independent across
    // partitions — a floating avg would be partition-order sensitive)
    val statCols =
      count(lit(1)).as("n") +:
        sum(TextAnalysis.tokenCount(text).cast("long")).as("sumdl") +:
        terms.map(t => sum(when(termFrequency(text, t) > 0, 1L).otherwise(0L)).as("df"))
    val statsRow = docs.agg(statCols.head, statCols.tail: _*).head()
    val n = statsRow.getLong(0)
    if (n == 0L) {
      // empty corpus: sum(dl) is NULL and avgdl would divide by zero —
      // return zero rows with the output schema instead of crashing
      return docs
        .select(col(idCol).as("id"), lit(0L).as("bm25_fixed"), lit(0L).as("rank"))
        .limit(0)
    }
    val avgdl = statsRow.getLong(1).toDouble / n.toDouble
    val idf = terms.indices.map { i =>
      val df = statsRow.getLong(2 + i).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val dl = TextAnalysis.tokenCount(text).cast("double")
    val score = terms.zip(idf).map { case (term, w) =>
      val tf = termFrequency(text, term).cast("double")
      lit(w) * tf * lit(k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    val scored = docs
      .select(col(idCol).as("id"), round(score * lit(1e6)).cast("long").as("bm25_fixed"))
      .filter(col("bm25_fixed") > 0)
    // top-k on the fixed-point score: optimizes to TakeOrderedAndProject
    // (per-partition heaps + driver merge), no global sort
    scored
      .orderBy(col("bm25_fixed").desc, col("id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25_fixed").desc, col("id"))).cast("long"))
  }
}
