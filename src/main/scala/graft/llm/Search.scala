package graft.llm

import graft.fs.ControlFs

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

  /** Persisted BM25 index layout version (bump on layout change — probes
    * refuse to read a layout they weren't built for). v2 added positional
    * postings (phrase probes); v3 moved the stats into `meta.parquet`
    * (written through Spark's filesystem layer like every other index in
    * the family — a driver-local java.nio stats file splits the index
    * across two filesystems on any cluster whose default FS isn't local)
    * and made the build crash-atomic: data tables stage under a fresh
    * `gen-*` subdir and the meta write is the LAST step, so a reader
    * never pairs new tables with stale stats (stale `termBuckets` would
    * silently prune the wrong partitions). */
  val IndexVersion = 3

  private[graft] final case class SearchMeta(
      termBuckets: Long, n: Long, sumdl: Long, gen: String)

  /** Build a persisted full-text index: a POSITIONAL postings table
    * (term, id, tf, position set) partitioned by a term-hash bucket
    * (vocabulary is too large for one directory per term; the bucket
    * gives partition pruning on the probe's literal bucket set), a
    * doc-length table, and a meta row (N, Σdl, termBuckets, generation).
    * One tokenize + one aggregation — the index build IS the stats pass
    * [[bm25TopK]] repeats per query, paid once; positions add phrase
    * capability for ~one extra int per token of index bytes.
    *
    * Publish order: both data tables land under a fresh generation dir,
    * THEN meta commits the generation — a crash mid-build leaves the
    * previous generation's meta+tables fully paired. Superseded
    * generations are kept one cycle for in-flight probes (the
    * [[IvfIndex]] keep-one rule), older ones swept.
    */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      termBuckets: Int = 64
  ): Unit = {
    require(termBuckets >= 1, s"termBuckets must be >= 1: $termBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val gen = IndexLayout.newGeneration()
    // spare for in-flight probes: the generation the current meta points
    // at, snapshotted before the meta overwrite below
    val prevGen = IndexLayout.publishedGen(spark, dir)
    // both passes below (tokenize→postings, tokenCount→doclen) are
    // CPU-bound per row: spread a narrow corpus — one small parquet
    // split — across the cluster first (no-op on already-parallel input)
    // text aliased in the same select as the id rename (a textCol
    // literally named "id" would otherwise duplicate downstream)
    val src = graft.operators.HotPath.spreadIfNarrow(
      docs.select(col(idCol).as("id"), col(textCol).as("__graft_text")))
    val toks = src
      .select(col("id"), posexplode(TextAnalysis.tokens(col("__graft_text"))))
      .select(col("id"), (col("pos") + 1).as("p"), col("col").as("term"))
    // positions are an unordered SET for the probe's membership tests —
    // sorting them per posting would buy nothing and cost a per-group sort
    //
    // The postings rows are CLUSTERED by term bucket before the
    // partitionBy("tb") write via an AQE REBALANCE (guide §6): without
    // it every (id,term)-keyed reduce task holds rows of every bucket
    // and opens tasks × buckets parquet writers; rebalanced, the total
    // file count is ≈ the bucket count. REBALANCE (unlike the
    // repartition(col("tb")) tried and reverted in r18) is AQE-managed:
    // tiny bucket partitions coalesce to a handful of write tasks (no
    // 32-way fat-task-binary fan-out at bench scale) and a skewed hot
    // bucket splits across tasks by mapper range at cluster scale.
    toks.groupBy("id", "term")
      .agg(count(lit(1)).as("tf"), collect_list(col("p")).as("positions"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(termBuckets.toLong)))
      .hint("rebalance", col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$dir/$gen/postings")
    // n/sumdl ride the doclen WRITE as an observe metric (the Ingest
    // bookkeeping pattern) — zero extra jobs, and stronger consistency
    // than even a read-back: the stats are computed from the exact rows
    // THIS write landed, so a non-deterministic `docs` (a table being
    // appended to, a sampling stage) can never publish idf/avgdl that
    // disagree with the tables they serve. (Pre-r19 this was a read-back
    // agg over the just-written parquet — one whole extra job per build.)
    val obs = org.apache.spark.sql.Observation(s"bm25_build_$gen")
    src.select(col("id"),
      TextAnalysis.tokenCount(col("__graft_text")).cast("long").as("dl"))
      .observe(obs, count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .write.mode("overwrite").parquet(s"$dir/$gen/doclen")
    val n = obs.get("n").asInstanceOf[Long]
    val sumdl = Option(obs.get("sumdl")).map(_.asInstanceOf[Long]).getOrElse(0L)
    IndexLayout.publishMeta(dir) { path =>
      Seq((IndexVersion, termBuckets.toLong, n, sumdl, gen))
        .toDF("version", "term_buckets", "n", "sumdl", "gen")
        .repartition(1)
        .write.mode("overwrite").parquet(path)
    }
    IndexLayout.sweepGenerations(spark, dir, keep = gen, prevPublished = prevGen)
  }

  /** BM25 top-k answered FROM the persisted index: the corpus is never
    * rescanned — the probe reads only the query terms' postings (bucket
    * partition pruning + term predicate pushdown), joins doc lengths,
    * and top-ks. Scoring is fixed-point per POSTING (each term's
    * contribution rounds to micros before the integer per-doc sum), so
    * the result is independent of float-summation order — the contract
    * an index answering across sessions needs. Returns
    * (id, bm25_fixed, rank) like [[bm25TopK]] (same formula; the two
    * differ only in where the per-term rounding happens).
    */
  def topKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val meta = readMeta(spark, dir)
    val n = meta.n
    if (n == 0L)
      return spark.range(0).select(col("id"), lit(0L).as("bm25_fixed"), lit(0L).as("rank"))
    val avgdl = meta.sumdl.toDouble / n.toDouble
    // bucket ids via the SAME engine hash the build used (one k-term job)
    val postings = probePostings(spark, dir, terms, meta)
    // per-term document frequencies: reads only the probed postings
    val dfByTerm = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct: query terms are a SET here too (duplicate branches in the
    // when-chain below would be unreachable, and the postings join already
    // scores each (doc, term) once)
    val idf = terms.distinct.map { t =>
      val df = dfByTerm.getOrElse(t, 0L).toDouble
      t -> math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val idfCol = idf.tail.foldLeft(
      when(col("term") === idf.head._1, lit(idf.head._2))) {
      case (acc, (t, w)) => acc.when(col("term") === t, lit(w))
    }
    val doclen = spark.read.parquet(s"$dir/${meta.gen}/doclen")
    val tf = col("tf").cast("double")
    val dl = col("dl").cast("double")
    val contrib = idfCol * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    postings.join(doclen, "id")
      .select(col("id"), round(contrib * lit(1e6)).cast("long").as("m"))
      .groupBy("id").agg(sum("m").as("bm25_fixed"))
      .filter(col("bm25_fixed") > 0)
      .orderBy(col("bm25_fixed").desc, col("id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25_fixed").desc, col("id"))).cast("long"))
  }

  /** Meta row with the layout-version guard every probe shares; resolved
    * ONCE per operation so stats and the generation's tables always come
    * from the same build.
    */
  private def readMeta(
      spark: org.apache.spark.sql.SparkSession, dir: String): SearchMeta = {
    // a legacy v2 index has NO meta table at all (stats lived in a
    // driver-local stats.json) — probe first so it gets the same friendly
    // rebuild message instead of a raw PATH_NOT_FOUND from the read
    val metaPath = IndexLayout.metaTablePath(dir).getOrElse(throw
      new IllegalArgumentException(
        s"BM25 index at $dir predates layout v$IndexVersion — rebuild the index"))
    val meta = spark.read.parquet(metaPath)
    require(meta.columns.contains("version") && meta.columns.contains("gen"),
      s"BM25 index at $dir predates layout v$IndexVersion — rebuild the index")
    val r = meta.select("version", "term_buckets", "n", "sumdl", "gen").head()
    require(r.getInt(0) == IndexVersion,
      s"BM25 index at $dir has layout version ${r.getInt(0)}, " +
        s"this engine reads $IndexVersion — rebuild the index")
    SearchMeta(r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  /** Postings rows for the probed terms: bucket partition pruning (the
    * terms' hash buckets as a literal IN) plus the term predicate pushed
    * into the parquet scan — the corpus itself is never touched.
    */
  private def probePostings(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      terms: Seq[String],
      meta: SearchMeta
  ): DataFrame = {
    // bucket ids via the SAME engine hash the build used. A LocalRelation
    // (not spark.range) so constant folding evaluates the literal hashes
    // at PLAN time — head() returns without scheduling a Spark job, where
    // the Range-based formulation paid one 1-task job per probe
    val buckets = {
      import spark.implicits._
      Seq(0).toDF("z").select(
        terms.distinct.map(t => pmod(xxhash64(lit(t)), lit(meta.termBuckets)).as(t)): _*).head()
        .toSeq.map(_.asInstanceOf[Long]).distinct
    }
    spark.read.parquet(s"$dir/${meta.gen}/postings")
      .filter(col("tb").isin(buckets: _*) && col("term").isin(terms.distinct: _*))
  }

  /** Exact phrase search FROM the index: each phrase slot's postings join
    * on the doc id and a start position must line up across every slot
    * (slot i's position set must contain start + i). Reads only the
    * phrase terms' postings — no corpus scan,
    * no text re-tokenization; k-1 joins over term-sized inputs. Returns
    * matching doc ids.
    */
  def phraseIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      phrase: Seq[String]
  ): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val meta = readMeta(spark, dir)
    val postings = probePostings(spark, dir, phrase, meta)
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t).select(col("id"), col("positions").as(s"p$i"))
    }
    val joined = slots.reduce(_.join(_, "id"))
    val starts = phrase.indices.tail.foldLeft(col("p0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"p$i"), p + i))
    }
    joined.filter(size(starts) > 0).select("id")
  }

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
    // query terms are a SET: the indexed twin scores each (doc, term)
    // posting once by construction, so duplicates in the caller's list
    // must not double a term's contribution here — dedupe keeps the
    // documented "same formula as topKIndexed" contract exact
    val qTerms = terms.distinct
    val text = col(textCol)
    // one reduction for every statistic the scorer needs: N, avgdl, and
    // per-term document frequency
    // avgdl from an exact integer token sum (order-independent across
    // partitions — a floating avg would be partition-order sensitive)
    val statCols =
      count(lit(1)).as("n") +:
        sum(TextAnalysis.tokenCount(text).cast("long")).as("sumdl") +:
        qTerms.map(t => sum(when(termFrequency(text, t) > 0, 1L).otherwise(0L)).as("df"))
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
    val idf = qTerms.indices.map { i =>
      val df = statsRow.getLong(2 + i).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val dl = TextAnalysis.tokenCount(text).cast("double")
    val score = qTerms.zip(idf).map { case (term, w) =>
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

  /** Reciprocal-rank fusion (Cormack et al., the standard hybrid-retrieval
    * combiner): given N per-modality rankings — each (id, rank), e.g. BM25
    * lexical top-k and embedding-cosine top-k — score every id seen in any
    * list as `Σ 1/(k0 + rank_i)` (absent lists contribute 0) and return
    * the fused top-k. Rank-based, so the modalities' incomparable raw
    * scores never mix; `k0 = 60` is the published default.
    *
    * Scale shape: the inputs are ALREADY top-k lists (k rows each, by
    * construction of the upstream retrievers), so the N-way full-outer
    * join and the single-partition ranking window touch O(N·k) rows —
    * driver-trivial — while the heavy per-modality retrieval underneath
    * stays distributed. Never feed full corpus rankings through this; cut
    * to top-k first (that's also what makes RRF scores stable).
    *
    * Output: (id, rrf_micros, rank) — the fused score exchanged as exact
    * micros (`round(score·1e6)`), ties broken by id.
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking")
    val renamed = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col("id"), col("rank").cast("long").as(s"__rank_$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    // identical term ORDER on both engines: doubles are deterministic
    // under a fixed operation order, so the micros match bit-for-bit
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"__rank_$i").cast("double")), lit(0.0)))
      .reduce(_ + _)
    joined
      .withColumn("__s", score)
      .orderBy(col("__s").desc, col("id"))
      .limit(topK)
      .select(col("id"),
        round(col("__s") * lit(1e6)).cast("long").as("rrf_micros"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__s").desc, col("id"))).cast("long").as("rank"))
  }
}
