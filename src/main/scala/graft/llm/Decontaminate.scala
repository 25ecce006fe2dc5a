package graft.llm

import org.apache.spark.sql.{DataFrame, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
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

  /** Bloom-prefiltered overlap report — same result as [[overlapReport]]
    * bit for bit (a Bloom filter admits no false negatives, and the exact
    * index join removes its false positives), built for the scale where
    * the benchmark n-gram index strains a broadcast: the corpus's n-gram
    * stream is pruned MAP-SIDE by a few-MB Bloom bitmap before any join,
    * so the shuffle that feeds the exact match carries only the tiny
    * might-contain survivor fraction instead of every corpus n-gram.
    *
    * The Bloom is built distributed (Spark's codegen'd
    * `BloomFilterAggregate` tree-reduces per-partition bitmaps — the same
    * sketch the engine's runtime join filters use); only the final bitmap
    * lands on the driver (index-build-sized, like the BM25 stats row) and
    * is re-broadcast as a literal into the probe predicate. Both sides
    * key the filter on `xxhash64(ngram)`, so build and probe agree
    * exactly. The post-filter join is deliberately NOT broadcast-hinted:
    * when the benchmark index does fit, AQE broadcasts it on its own;
    * when it doesn't, the shuffle join only sees Bloom survivors.
    */
  def overlapReportBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minHits: Int = 1,
      fpp: Double = 0.01
  ): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val benchNg = benchmark
      .select(col(idCol).as("b_id"), explode(Dedup.shingles(col(textCol), n)).as("ng"))
      .localCheckpoint() // feeds the Bloom build AND the exact index
    // Spark caps BloomFilterAggregate at 4M items / 2^26 bits; an eval
    // set is orders of magnitude below both, and past the item cap the
    // filter just degrades to a higher fp rate (still no false negatives)
    val est = math.min(math.max(benchNg.count(), 1L), 4000000L)
    // m = -n ln(p) / ln(2)^2, the standard Bloom sizing
    val numBits = math.min(
      math.max((-est * math.log(fpp) / (math.log(2) * math.log(2))).toLong, 64L), 1L << 26)
    val bloomRow = benchNg.select(
      GraftInternal.column(new BloomFilterAggregate(
        GraftInternal.expression(xxhash64(col("ng"))),
        GraftInternal.expression(lit(est)),
        GraftInternal.expression(lit(numBits))).toAggregateExpression()).as("bf"))
      .head()
    if (bloomRow.isNullAt(0)) {
      // empty benchmark: nothing to match — the exact path is already free
      overlapReport(corpus, benchmark, idCol, textCol, n, minHits)
    } else {
      val bloomBytes = bloomRow.getAs[Array[Byte]](0)
      val benchIndex = benchNg.groupBy("ng").agg(min("b_id").as("first_benchmark_id"))
      val mightContain = GraftInternal.column(new BloomFilterMightContain(
        GraftInternal.expression(lit(bloomBytes)),
        GraftInternal.expression(xxhash64(col("ng")))))
      corpus
        .select(col(idCol).as("id"), explode(Dedup.shingles(col(textCol), n)).as("ng"))
        .filter(mightContain)
        .join(benchIndex, "ng")
        .groupBy("id")
        .agg(
          count(lit(1)).as("hit_ngrams"), // shingles are distinct per doc
          min("first_benchmark_id").as("first_benchmark_id"))
        .filter(col("hit_ngrams") >= minHits)
    }
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
