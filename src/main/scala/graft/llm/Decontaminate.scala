package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word
  * n-grams with a benchmark/eval set — the standard pre-training hygiene
  * pass that keeps test data out of the training corpus (the n-gram
  * overlap rule popularized by the GPT-3 and PaLM dataset reports).
  *
  * 100 TB shape: the benchmark side is an eval set — thousands of
  * documents, millions of n-grams — which is index-build-sized, so its
  * distinct (n-gram → earliest benchmark doc) map is BROADCAST and the
  * corpus scan never shuffles its full width: explode corpus n-grams,
  * map-side hash-join against the broadcast benchmark index, then one
  * partial-aggregated rollup per contaminated doc id (a tiny fraction of
  * the corpus). No corpus self-join, no benchmark-side shuffle.
  */
object Decontaminate {

  /** Per-contaminated-doc overlap report: corpus docs sharing at least
    * `minHits` distinct word `n`-grams with any benchmark doc. Returns
    * (id, hit_ngrams = distinct overlapping n-grams, first_benchmark_id =
    * lowest benchmark doc id evidencing the overlap).
    */
  def overlapReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minHits: Int = 1
  ): DataFrame = {
    // one row per distinct benchmark n-gram, carrying the earliest doc
    // that contains it (min is the right witness: deterministic and
    // reproducible across runs/engines)
    val benchIndex = benchmark
      .select(col(idCol).as("b_id"), explode(Dedup.shingles(col(textCol), n)).as("ng"))
      .groupBy("ng")
      .agg(min("b_id").as("first_benchmark_id"))
    val corpusNgrams = corpus
      .select(col(idCol).as("id"), explode(Dedup.shingles(col(textCol), n)).as("ng"))
    corpusNgrams
      .join(broadcast(benchIndex), "ng")
      .groupBy("id")
      .agg(
        count(lit(1)).as("hit_ngrams"), // shingles are distinct per doc
        min("first_benchmark_id").as("first_benchmark_id"))
      .filter(col("hit_ngrams") >= minHits)
  }

  /** The removal composition: corpus minus contaminated docs (broadcast
    * anti-join against the report's id set — the survivor stream stays a
    * single map-side pass over the corpus).
    */
  def removeContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minHits: Int = 1
  ): DataFrame = {
    val hits = overlapReport(corpus, benchmark, idCol, textCol, n, minHits)
      .select(col("id").as(idCol))
    corpus.join(broadcast(hits), Seq(idCol), "left_anti")
  }
}
