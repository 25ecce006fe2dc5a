package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe: runs the heaviest pipeline family — MinHash-LSH
  * candidate pairs → connected components → canonical-copy curation (the
  * `dedup_minhash` → `dedup_groups` → `pipeline_dedup_curate` chain) — at
  * 1×, 3×, and 10× the sf0.1 documents table and reports the wall-clock
  * scaling exponent `log(t_k/t_1)/log(k)` per step-up. An exponent near
  * 1.0 is linear scaling (the design claim); ≥1.5 would flag a
  * super-linear term (candidate-pair blowup, driver funnel) before a real
  * cluster ever sees it. Results are recorded in SCALE.md.
  *
  * The k× corpus is k letter-ROTATED copies of sf0.1 (`translate` over
  * the alphabet): rotation changes every token, so copies never near-dup
  * against each other, and the duplicate STRUCTURE — the thing LSH work
  * actually scales with — grows linearly with k. Naive duplication
  * (k identical copies) would instead grow every duplicate group k-fold
  * and the within-group pair count k²-fold: a skew stress test, not a
  * corpus-growth model.
  *
  * Modes (first arg; results recorded in SCALE.md):
  *  - (none) / `k1,k2,...`    — dedup chain at k× docs
  *  - `ann[:k1,k2,...]`       — IVF build/probe at k× embeddings
  *  - `annbig[:n1,n2,...]`    — IVF build at MILLIONS of synthetic
  *                              vectors (SPARK_DRIVER_MEM=64g for 10M)
  *  - `search[:k1,k2,...]`    — BM25 index build/probe at k× docs
  *  - `stream[:TxR,...]`      — commit machinery: tables × rows/batch
  *  - `prop[:n1,n2,...]`      — score propagation at n-node graphs
  *  - `cdc[:k1,k2,...]`       — read latency vs accumulated delta commits
  *  - `rebal[:n0,factor]`     — IVF probe latency before/after rebalance
  *  - `sem[:n1,n2,...]`       — SemDeDup fixed-k vs auto-k exponents
  *  - `wprobe[:cells,vecs]`   — two-level IVF recall@10 vs wProbe/nProbe
  *  - `dim[:d1,d2,...]`       — embedding-width scaling (fused vs HOF, LSH)
  *  - `loghist[:n1,n2,...]`   — per-commit latency vs accumulated log
  *                              history (checkpoint-retention flatness)
  *
  * `sbt "runMain graft.tools.ScaleProbe"` (~2 GiB peak, a few minutes).
  */
object ScaleProbe {
  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Copy-`i` alphabet rotation — ONE definition for every synthetic
    * text fixture (this file's `scaled` and [[Sf1Probe]]'s shards), so
    * a tweak to the distribution cannot silently diverge between the
    * probes and the sf1 generator.
    */
  private[tools] def rotAlpha(i: Int, c: Column): Column = {
    val r = i % 26
    translate(c, Alpha, Alpha.drop(r) + Alpha.take(r))
  }

  /** Deterministic synthetic embedding: 64 dims in [-1, 1], each a pure
    * function of (id, dim) via xxhash64 — ONE definition for the
    * annbig/rebal/route probe families (previously three hand copies;
    * a missed edit would have made them measure different corpora).
    */
  private[tools] def synthVec(idc: Column): Column =
    array((0 until 64).map(d => synthDim(idc, d).cast("float")): _*)

  /** Double-element variant — routeProbe's recorded SCALE.md baselines
    * (the r13 one-level vs two-level table) were measured on double
    * vectors; silently halving the element width would make the next
    * probe run diverge from those numbers for fixture reasons, not code.
    */
  private[tools] def synthVecD(idc: Column): Column =
    array((0 until 64).map(d => synthDim(idc, d)): _*)

  private def synthDim(idc: Column, d: Int): Column =
    (pmod(xxhash64(idc, lit(d)), lit(2000001L)) - lit(1000000L)).cast("double") / lit(1e6)

  def scaled(base: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        rotAlpha(i, col("text")).as("text"))
    }.reduce(_.unionByName(_))

  /** The measured chain; returns (curated survivor count, dup-pair count). */
  def chain(docs: DataFrame): (Long, Long) = {
    val pairs = graft.llm.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, threshold = 0.5).localCheckpoint()
    val nPairs = pairs.count()
    val groups = graft.llm.Dedup.connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    val withGroup = docs.join(groups, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("group_id"), col("doc_id")))
    val canonical = withGroup.filter(col("doc_id") === col("group_id"))
    val n = graft.llm.TextAnalysis.qualitySignals(canonical, "text")
      .filter(col("is_quality")).count()
    (n, nPairs)
  }

  private def tmpDir(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  /** Release all pinned localCheckpoint blocks between probe iterations —
    * without it each k's corpus (and the operators' internal checkpoints)
    * stays in block storage and the LAST iteration pays eviction/spill
    * pressure the first never saw, skewing the fitted exponent. Blocking,
    * so cleanup can't race the next timed region or `spark.stop()`.
    */
  private def dropPinned(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

  /** ANN family probe: IVF index build (O(corpus): centroid training +
    * assignment write) and batch probe (O(probed cells)) at k× the sf0.1
    * embeddings table. Copies are circularly SHIFTED vectors (norm
    * preserved, neighbor structure decorrelated across shifts; shifts
    * repeat past k=64 — same caveat as the text rotations).
    */
  private def annProbe(spark: SparkSession, ks: Seq[Int]): Unit = {
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    def scaledE(k: Int): DataFrame =
      (0 until k).map { i =>
        val s = i % 64
        val emb =
          if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, 64 - s), slice(col("embedding"), 1, s))
        base.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          emb.as("embedding"))
      }.reduce(_.unionByName(_))
    val queries = base.filter(col("vec_id") < 20)
    locally { // warm JIT/codegen
      val d = tmpDir("annwarm")
      graft.llm.IvfIndex.build(scaledE(1), "vec_id", "embedding", d, nCells = 64, kmeansIters = 2)
      graft.llm.IvfIndex.query(spark, d, queries, "vec_id", "embedding", k = 10, nProbe = 8).count()
    }
    val results = ks.map { k =>
      val corpus = scaledE(k).localCheckpoint()
      val n = corpus.count()
      val dir = tmpDir(s"annscale$k")
      val t0 = System.nanoTime()
      graft.llm.IvfIndex.build(corpus, "vec_id", "embedding", dir, nCells = 64, kmeansIters = 2)
      val tb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hits = graft.llm.IvfIndex
        .query(spark, dir, queries, "vec_id", "embedding", k = 10, nProbe = 8).count()
      val tp = (System.nanoTime() - t1) / 1e9
      dropPinned(spark)
      println(f"k=$k%3d vecs=$n%8d build=$tb%7.2f s probe=$tp%6.2f s hits=$hits%4d")
      (k, tb, tp)
    }
    val (k1, b1, p1) = results.head
    results.tail.foreach { case (k, b, p) =>
      val eb = math.log(b / b1) / math.log(k.toDouble / k1)
      val ep = math.log(p / p1) / math.log(k.toDouble / k1)
      println(f"scaling exponent ${k1}x -> ${k}x: build $eb%.2f probe $ep%.2f (1.0 = linear)")
    }
  }

  /** Persisted-search-index family probe: BM25 index build (O(corpus):
    * tokenize + posting aggregation + bucketed write) and 3-term probe
    * (`topKIndexed`: bucket-pruned postings read, never a corpus scan) at
    * k× the sf0.1 documents table. The k× corpus is PLAIN REPLICATION
    * with shifted doc_ids — the right growth model here (unlike dedup,
    * search has no pair blowup to avoid, and replication grows each
    * probed term's postings list exactly k×, which is what real corpus
    * growth does to a term's document frequency).
    */
  private def searchProbe(spark: SparkSession, ks: Seq[Int]): Unit = {
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    def scaledD(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
      }.reduce(_.unionByName(_))
    val terms = Seq("spark", "join", "shuffle")
    locally { // warm JIT/codegen
      val d = tmpDir("searchwarm")
      graft.llm.Search.buildIndex(scaledD(1), "doc_id", "text", d)
      graft.llm.Search.topKIndexed(spark, d, terms, k = 10).count()
    }
    val results = ks.map { k =>
      val corpus = scaledD(k).localCheckpoint()
      val n = corpus.count()
      val dir = tmpDir(s"searchscale$k")
      val t0 = System.nanoTime()
      graft.llm.Search.buildIndex(corpus, "doc_id", "text", dir)
      val tb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hits = graft.llm.Search.topKIndexed(spark, dir, terms, k = 10).count()
      val tp = (System.nanoTime() - t1) / 1e9
      dropPinned(spark)
      println(f"k=$k%3d docs=$n%8d build=$tb%7.2f s probe=$tp%6.2f s hits=$hits%4d")
      (k, tb, tp)
    }
    val (k1, b1, p1) = results.head
    results.tail.foreach { case (k, b, p) =>
      val eb = math.log(b / b1) / math.log(k.toDouble / k1)
      val ep = math.log(p / p1) / math.log(k.toDouble / k1)
      println(f"scaling exponent ${k1}x -> ${k}x: build $eb%.2f probe $ep%.2f (1.0 = linear)")
    }
  }

  /** Compute-bound IVF build probe: SYNTHETIC corpora (deterministic
    * hash-derived 64-dim vectors, no dependence on the tiny sf tables) at
    * millions of vectors, where Lloyd-iteration distance math — not job
    * setup — dominates the build. Run with SPARK_DRIVER_MEM=64g for the
    * 10M point (two materialized copies of 10M×64 doubles).
    */
  private def annBigProbe(spark: SparkSession, sizes: Seq[Long]): Unit = {
    def synth(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"), synthVec(col("id")).as("embedding"))
    val queries = synth(20)
    locally { // warm JIT/codegen
      val d = tmpDir("annbigwarm")
      graft.llm.IvfIndex.build(synth(50000L), "vec_id", "embedding", d, nCells = 64, kmeansIters = 2)
      graft.llm.IvfIndex.query(spark, d, queries, "vec_id", "embedding", k = 10, nProbe = 8).count()
    }
    val results = sizes.map { n =>
      val corpus = synth(n).localCheckpoint()
      corpus.count()
      val dir = tmpDir(s"annbig$n")
      val t0 = System.nanoTime()
      graft.llm.IvfIndex.build(corpus, "vec_id", "embedding", dir, nCells = 64, kmeansIters = 2)
      val tb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hits = graft.llm.IvfIndex
        .query(spark, dir, queries, "vec_id", "embedding", k = 10, nProbe = 8).count()
      val tp = (System.nanoTime() - t1) / 1e9
      dropPinned(spark)
      println(f"n=$n%9d build=$tb%8.2f s probe=$tp%6.2f s hits=$hits%4d")
      (n, tb, tp)
    }
    val (n1, b1, p1) = results.head
    results.tail.foreach { case (n, b, p) =>
      val eb = math.log(b / b1) / math.log(n.toDouble / n1)
      val ep = math.log(p / p1) / math.log(n.toDouble / n1)
      println(f"scaling exponent ${n1} -> ${n}: build $eb%.2f probe $ep%.2f (1.0 = linear)")
    }
  }

  /** CDC/MERGE read-path probe: equality-delete ACCUMULATION is the
    * classic Iceberg-v2 read amplification (reference delta semantics:
    * `data/BaseDeltaTaskWriter.java:71-84` — every upsert batch adds an
    * equality-delete file the current-state read must anti-join).
    * Measures read latency as a function of accumulated delta commits,
    * then after `compact` (which applies and clears them); fits the
    * latency-vs-commits exponent — the number that dictates compaction
    * cadence on a real deployment.
    */
  private def cdcProbe(spark: SparkSession, ks: Seq[Int]): Unit = {
    import graft.config.{EngineConfig, TableConfig}
    val baseRows = 200000L
    val slice = baseRows / 10
    def mk(ids: org.apache.spark.sql.Column, salt: Long): DataFrame =
      spark.range(slice).select(
        ids.as("user_id"),
        (col("id") + salt * 1000000L).as("event_id"),
        concat(lit("t"), pmod(col("id"), lit(5L))).as("event_type"),
        (col("id") % 997L).cast("double").as("value"))
    def upsertBatch(i: Int): DataFrame =
      mk(col("id") + (i % 10).toLong * slice, i.toLong)
    def baseData: DataFrame =
      spark.range(baseRows).select(
        col("id").as("user_id"), col("id").as("event_id"),
        concat(lit("t"), pmod(col("id"), lit(5L))).as("event_type"),
        (col("id") % 997L).cast("double").as("value"))
    def cfgFor(wh: String) = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("state", idColumns = Seq("user_id"))),
      upsertMode = true, autoCreate = true)
    locally { // warm the delta write + read path
      val cfg = cfgFor(tmpDir("cdcwarm"))
      graft.sink.Ingest.run(spark, baseData.limit(10000), 0L, cfg)
      graft.sink.Ingest.run(spark, upsertBatch(1).limit(1000), 1L, cfg)
      graft.table.IceTable.load(s"${cfg.warehouse}/state").read(spark).count()
    }
    def readTime(t: graft.table.IceTable): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = t.read(spark).count()
      require(n == baseRows, s"upsert state drifted: $n != $baseRows")
      (System.nanoTime() - t0) / 1e9
    }.min
    val results = ks.map { k =>
      val wh = tmpDir(s"cdcscale$k")
      val cfg = cfgFor(wh)
      graft.sink.Ingest.run(spark, baseData, 0L, cfg)
      (1 to k).foreach(i => graft.sink.Ingest.run(spark, upsertBatch(i), i.toLong, cfg))
      val t = graft.table.IceTable.load(s"$wh/state")
      val tRead = readTime(t)
      val tc0 = System.nanoTime()
      t.compact(spark)
      val tCompact = (System.nanoTime() - tc0) / 1e9
      val tAfter = readTime(t)
      dropPinned(spark)
      println(f"deltas=$k%3d read=$tRead%6.2f s compact=$tCompact%6.2f s " +
        f"read_after=$tAfter%6.2f s amplification=${tRead / tAfter}%5.2fx")
      (k, tRead, tAfter)
    }
    val (k1, r1, _) = results.head
    results.tail.foreach { case (k, r, _) =>
      val e = math.log(r / r1) / math.log(k.toDouble / k1)
      println(f"read-latency exponent $k1 -> $k deltas: $e%.2f (0 = flat, 1 = linear in commits)")
    }
  }

  /** IVF cell-geometry rebalance probe — the SCALE.md knob made
    * executable: at FIXED geometry a probe reads n/nCells rows per
    * probed cell, so 10x corpus growth via append makes probes ~10x
    * slower; [[graft.llm.IvfIndex.rebalance]] re-shards to restore
    * target occupancy and the probe returns to ~initial latency while
    * the corpus stays 10x bigger.
    */
  private def rebalProbe(spark: SparkSession, n0: Long, factor: Int): Unit = {
    def synth(from: Long, n: Long): DataFrame =
      spark.range(from, from + n)
        .select(col("id").as("vec_id"), synthVec(col("id")).as("embedding"))
    // 200 queries so scanned-rows work dominates the fixed per-job cost
    val queries = synth(0, 200).localCheckpoint()
    locally { // warm
      val d = tmpDir("rebalwarm")
      graft.llm.IvfIndex.build(synth(0, 20000), "vec_id", "embedding", d, nCells = 8)
      graft.llm.IvfIndex.query(spark, d, queries, "vec_id", "embedding", k = 10, nProbe = 4).count()
      graft.llm.IvfIndex.rebalance(spark, d, targetCellRows = 500)
    }
    val dir = tmpDir(s"rebal$n0")
    val nCells = 32
    graft.llm.IvfIndex.build(synth(0, n0).localCheckpoint(), "vec_id", "embedding", dir,
      nCells = nCells, kmeansIters = 2)
    def probeTime(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.llm.IvfIndex.query(spark, dir, queries, "vec_id", "embedding",
        k = 10, nProbe = 4).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    def occupancy(cells: Long): Long =
      spark.read.parquet(s"${graft.llm.IvfIndex.activeDir(dir)}/assignments.parquet")
        .count() / math.max(1L, cells)
    val tBase = probeTime()
    val occBase = occupancy(nCells.toLong)
    graft.llm.IvfIndex.append(spark, dir,
      synth(n0, n0 * (factor - 1)).localCheckpoint(), "vec_id", "embedding")
    val tGrown = probeTime()
    val occGrown = occupancy(nCells.toLong)
    val target = math.max(1L, n0 / nCells)
    val tr0 = System.nanoTime()
    // 1 Lloyd iteration: the retrain is a ROUTING refresh, not a quality
    // pass — the probe measures geometry, and halving the retrain cost
    // keeps the rebalance-vs-rebuild comparison honest
    val newCells = graft.llm.IvfIndex.rebalance(spark, dir, targetCellRows = target,
      kmeansIters = 1)
    val tReb = (System.nanoTime() - tr0) / 1e9
    val tAfter = probeTime()
    val occAfter = occupancy(newCells.toLong)
    dropPinned(spark)
    println(f"n0=$n0%8d grown=${n0 * factor}%9d cells $nCells -> $newCells rebalance=$tReb%7.2f s")
    println(f"occupancy rows/cell: base=$occBase%7d grown=$occGrown%7d rebalanced=$occAfter%7d")
    println(f"probe (200 queries): base=$tBase%6.2f s grown=$tGrown%6.2f s rebalanced=$tAfter%6.2f s " +
      f"(grown/base=${tGrown / tBase}%5.2fx, rebalanced/base=${tAfter / tBase}%5.2fx)")
  }

  /** Streaming-ingest commit-machinery probe (K9/K10 at fleet scale):
    * wall-clock for 5 identical micro-batches through `Ingest.run` as a
    * function of (table fan-out × rows per batch). With no route field
    * every table receives the whole batch (R1 broadcast), so `nTables`
    * multiplies the COMMIT count while the batch scan is shared via the
    * multi-table persist — the design claim is table-count cost well
    * below linear (the K10 parallel commit pool overlaps per-table
    * writes) and batch-size cost ~linear (data write dominates, commit
    * fixed cost bounded).
    */
  private def streamProbe(spark: SparkSession, combos: Seq[(Int, Int)]): Unit = {
    import graft.config.{EngineConfig, TableConfig}
    val nBatches = 5
    def mkBatch(rows: Int): DataFrame =
      spark.range(rows.toLong).select(
        col("id").as("event_id"), pmod(col("id"), lit(97L)).as("user_id"),
        concat(lit("type"), pmod(col("id"), lit(5L))).as("event_type"),
        (col("id") % 1000L).cast("double").as("value"))
    locally { // warm JIT/codegen + commit path
      val cfg = EngineConfig(warehouse = tmpDir("streamwarm"),
        tables = Seq(TableConfig("w0")), autoCreate = true)
      graft.sink.Ingest.run(spark, mkBatch(10000), 0L, cfg)
    }
    val results = combos.map { case (nt, rows) =>
      val wh = tmpDir(s"streamscale_${nt}t_${rows}r")
      val batch = mkBatch(rows).localCheckpoint()
      val cfg = EngineConfig(warehouse = wh,
        tables = (1 to nt).map(i => TableConfig(s"t$i")), autoCreate = true)
      graft.sink.Ingest.run(spark, batch, 0L, cfg) // auto-create outside the timing
      val t0 = System.nanoTime()
      (1 to nBatches).foreach(b => graft.sink.Ingest.run(spark, batch, b.toLong, cfg))
      val dt = (System.nanoTime() - t0) / 1e9
      val commits = nt * nBatches
      println(f"tables=$nt%3d rows=$rows%8d batches=$nBatches commits=$commits%4d " +
        f"time=$dt%6.2f s commits/s=${commits / dt}%7.1f batch_ms=${dt / nBatches * 1000}%7.0f")
      // drop THIS combo's checkpointed batch before the next is timed —
      // every other probe family does; without it later combos run under
      // block-eviction pressure the first never saw, skewing the exponent
      dropPinned(spark)
      (nt, rows, dt)
    }
    results.headOption.foreach { case (nt1, r1, t1) =>
      results.tail.foreach { case (nt, r, t) =>
        val k = (nt.toDouble * r) / (nt1.toDouble * r1)
        if (k > 1.0) {
          val e = math.log(t / t1) / math.log(k)
          println(f"scaling exponent vs first (${k}%.0fx work): $e%.2f (1.0 = linear)")
        }
      }
    }
  }

  /** Score-propagation probe: [[graft.llm.Propagate.propagateScores]] on a
    * synthetic hash-derived graph (n nodes, ~4n undirected pair rows →
    * ~8n directed edges after normalization) for 3 rounds. The design
    * claim is ONE edge⋈score join + one aggregation per round with
    * constant plan depth (per-round checkpoint) — cost linear in |E|,
    * independent of round count beyond the multiplier.
    */
  private def propProbe(spark: SparkSession, sizes: Seq[Long]): Unit = {
    def graph(n: Long): (DataFrame, DataFrame) = {
      val nodes = spark.range(n).select(col("id"),
        (pmod(xxhash64(col("id")), lit(1000001L))).as("s0_micros"))
      val edges = spark.range(n).select(col("id").as("id_a"),
        explode(array((0 until 4).map(j =>
          pmod(xxhash64(col("id"), lit(j)), lit(n))): _*)).as("id_b"))
      (nodes, edges)
    }
    locally { // warm JIT/codegen
      val (wn, we) = graph(50000L)
      graft.llm.Propagate.propagateScores(wn, we).count()
    }
    val results = sizes.map { n =>
      val (nodes0, edges0) = graph(n)
      val nodes = nodes0.localCheckpoint()
      val edges = edges0.localCheckpoint()
      nodes.count(); val ne = edges.count()
      val t0 = System.nanoTime()
      val rows = graft.llm.Propagate.propagateScores(nodes, edges, rounds = 3).count()
      val dt = (System.nanoTime() - t0) / 1e9
      dropPinned(spark)
      println(f"n=$n%9d edges=$ne%9d time=$dt%7.2f s out_rows=$rows%9d")
      (n, dt)
    }
    val (n1, t1) = results.head
    results.tail.foreach { case (n, t) =>
      val e = math.log(t / t1) / math.log(n.toDouble / n1)
      println(f"scaling exponent ${n1} -> ${n}: $e%.2f (1.0 = linear)")
    }
  }

  /** Routing-shape probe (r12 verdict "What's wrong #3"): cost of
    * assigning a fixed 200 k-row batch and probing a fixed 200-query set
    * as the CELL COUNT grows, one-level (driver-collected centroid table
    * + literal argmax expression) vs two-level (√nCells super table
    * collected; cells joined per super). The one-level arm is
    * constructible only at small nCells — the collect is O(nCells·dim)
    * on the driver and the argmax is an nCells-branch expression — so it
    * is capped here; the claim under test is that the two-level arm
    * stays ~flat into the 10^5 range the rebalance arithmetic
    * (`nCells' = vectors / targetCellRows`) reaches at 10^10 vectors.
    * Geometry is synthesized directly (routing cost does not depend on
    * centroid quality), timed through the production [[graft.llm.IvfIndex.routeRows]]
    * / [[graft.llm.IvfIndex.probeRows]] paths.
    */
  def routeProbe(spark: SparkSession, sizes: Seq[Int]): Unit = {
    import spark.implicits._
    import graft.llm.{IvfIndex, Similarity}
    def timeMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    for (n <- sizes) {
      // pinned frames are rebuilt per size: dropPinned() between sizes
      // releases them (a shared checkpoint would lose its blocks)
      val queries = spark.range(0, 200)
        .select(col("id").as("vec_id"), synthVecD(col("id") + 7).as("embedding"))
        .localCheckpoint()
      val nb = spark.range(0, 200000)
        .select(col("id").as("n_id"), Similarity.normalize(synthVecD(col("id"))).as("n_vec"))
        .localCheckpoint()
      val s = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
      val cps = (n + s - 1) / s
      val d2 = tmpDir(s"route2-$n")
      spark.range(s).select(col("id").as("s_id"),
        Similarity.normalize(synthVecD(col("id") + 2000000)).as("s_vec"))
        .coalesce(1).write.parquet(s"$d2/supers.parquet")
      spark.range(n).select(col("id").as("c_id"),
        Similarity.normalize(synthVecD(col("id") + 1000000)).as("c_vec"),
        (col("id") / cps).cast("long").as("s_id"))
        .coalesce(8).write.parquet(s"$d2/centroids.parquet")
      val r2 = timeMin(IvfIndex.routeRows(spark, d2, nb).count())
      val p2 = timeMin(
        IvfIndex.probeRows(spark, d2, queries, "vec_id", "embedding", 16, 8).count())
      if (n <= 16384) {
        val d1 = tmpDir(s"route1-$n")
        spark.range(n).select(col("id").as("c_id"),
          Similarity.normalize(synthVecD(col("id") + 1000000)).as("c_vec"))
          .coalesce(8).write.parquet(s"$d1/centroids.parquet")
        val r1 = timeMin(IvfIndex.routeRows(spark, d1, nb).count())
        val p1 = timeMin(
          IvfIndex.probeRows(spark, d1, queries, "vec_id", "embedding", 16, 8).count())
        println(f"nCells=$n%8d  one-level route=$r1%7.2f s probe=$p1%7.2f s | " +
          f"two-level route=$r2%7.2f s probe=$p2%7.2f s (supers=$s)")
      } else {
        println(f"nCells=$n%8d  one-level  (not constructible: driver collect + " +
          f"$n-branch expression) | two-level route=$r2%7.2f s probe=$p2%7.2f s (supers=$s)")
      }
      dropPinned(spark)
    }
  }

  /** Commit-machinery cost vs ACCUMULATED history: drive a bare
    * [[graft.table.CommitLog]] to n committed entries and report the
    * amortized per-commit latency over the final 100. Pure metadata (no
    * Spark jobs) — it isolates the directory-listing + fence + link
    * path a streaming sink pays on EVERY trigger. With checkpoint
    * retention (r13) the directory stays bounded at ~2 checkpoint
    * intervals of files, so the curve must be FLAT in n; pre-retention
    * it grew O(n) per listing (O(n²) cumulative).
    */
  private def logHistProbe(ns: Seq[Int]): Unit = {
    val results = ns.map { n =>
      val dir = tmpDir(s"loghist$n")
      val log = new graft.table.CommitLog(dir)
      var i = 0
      while (i < n - 100) {
        log.commit(i.toLong, s => graft.table.Commit(s, i.toLong, s"c$i", 0L, 1)); i += 1
      }
      val t0 = System.nanoTime()
      while (i < n) {
        log.commit(i.toLong, s => graft.table.Commit(s, i.toLong, s"c$i", 0L, 1)); i += 1
      }
      val perMs = (System.nanoTime() - t0) / 1e6 / 100.0
      val files = new java.io.File(dir).list().length
      println(f"history=$n%6d dir_files=$files%5d last100_per_commit=$perMs%7.3f ms")
      (n, perMs, files)
    }
    results.headOption.foreach { case (n1, t1, _) =>
      results.tail.foreach { case (n, t, _) =>
        println(f"ratio ${n1}%d -> ${n}%d: ${t / t1}%.2f (flat = retention holding)")
      }
    }
  }

  /** Two-level IVF recall study — the wProbe knob. Two-level routing
    * changes the reachable candidate set vs one-level: a query sees only
    * cells under its `wProbe` nearest SUPERS, so wProbe caps recall no
    * matter how large nProbe is. The corpus here is CLUSTERED (5000
    * centers + per-vector jitter): on the uniform synthVec corpus a
    * 65k-cell geometry probes ~0.05% of cells and ANY IVF's recall is
    * trivially ~0 — no routing quality signal. With real neighbor
    * structure, recall@10 vs wProbe measures exactly what the default
    * wProbe = 8 buys.
    */
  private def wProbeRecall(
      spark: SparkSession, nCells: Int, nVecs: Long, ws: Seq[Int]): Unit = {
    import spark.implicits._
    import graft.llm.{IvfIndex, Similarity}
    val nCenters = 5000
    val corpus = spark.range(nVecs).select(
      col("id").as("vec_id"),
      zip_with(synthVecD(pmod(col("id"), lit(nCenters.toLong))),
        synthVecD(col("id") + 900000000L),
        (a, b) => a + lit(0.15) * b).as("embedding"))
      .localCheckpoint()
    val dir = tmpDir(s"wprobe$nCells")
    val t0 = System.nanoTime()
    val written = IvfIndex.build(corpus, "vec_id", "embedding", dir,
      nCells = nCells, kmeansIters = 2)
    println(f"[wprobe] built $written%d cells over $nVecs%d vecs " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val queries = corpus.filter(col("vec_id") % 97 === 0).limit(50).localCheckpoint()
    val brute = Similarity.bruteForceKnn(corpus, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    for (w <- ws) {
      val got = IvfIndex.query(spark, dir, queries, "vec_id", "embedding",
        k = 10, nProbe = 32, wProbe = w)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val recall = (brute & got).size.toDouble / brute.size
      println(f"[wprobe] nCells=$written%d wProbe=$w%3d nProbe= 32 recall@10=$recall%.3f")
    }
    // and the nProbe axis at the default wProbe, to show which knob binds
    for (np <- Seq(8, 32, 128)) {
      val got = IvfIndex.query(spark, dir, queries, "vec_id", "embedding",
        k = 10, nProbe = np, wProbe = 8)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val recall = (brute & got).size.toDouble / brute.size
      println(f"[wprobe] nCells=$written%d wProbe=  8 nProbe=$np%3d recall@10=$recall%.3f")
    }
    dropPinned(spark)
  }

  /** Embedding-width probe — pins two r13 claims at production dims
    * (d=768): (1) the fused ArrayNormalize kernel is O(d) per row where
    * the higher-order-function formulation re-runs the norm aggregate
    * per ELEMENT (O(d²) — Catalyst subexpression elimination does not
    * reach lambda bodies), so the fused/HOF gap must GROW ~linearly in d
    * on top of the linear base; (2) the hyperplane-LSH dedup family's
    * cost is dot-product-bound — ~linear in d at fixed corpus — with the
    * collision tail unchanged (signatures depend on bits/tables, not d).
    */
  private def dimProbe(spark: SparkSession, dims: Seq[Int], n: Long): Unit = {
    import graft.llm.{Dedup, Similarity}
    def vecAt(d: Int, idc: Column): Column =
      array((0 until d).map(i => synthDim(idc, i)): _*)
    def timeMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    val results = dims.map { d =>
      val df = spark.range(n)
        .select(col("id").as("vec_id"), vecAt(d, col("id")).as("v"))
        .localCheckpoint()
      df.count()
      val tFused = timeMin(
        df.select(Similarity.normalize(col("v")).as("nv"))
          .agg(sum(element_at(col("nv"), 1))).head())
      // the pre-r13 formulation: norm aggregate re-evaluated per element
      val hof = transform(col("v"),
        x => x / sqrt(aggregate(col("v"), lit(0.0), (a, e) => a + e * e)))
      val tHof = timeMin(
        df.select(hof.as("nv")).agg(sum(element_at(col("nv"), 1))).head())
      // hyperplane-LSH family at this width: planted twins through the
      // full candidate→exact-verify path (auto-sized bits/tables)
      val twins = df.filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + n).as("vec_id"), col("v"))
      val corpus = df.unionByName(twins).localCheckpoint()
      corpus.count()
      var pairs = 0L
      val tLsh = timeMin {
        pairs = Dedup.embeddingNearDupPairs(corpus, "vec_id", "v", threshold = 0.95).count()
      }
      dropPinned(spark)
      println(f"[dim] d=$d%4d fused=$tFused%6.2f s hof=$tHof%7.2f s " +
        f"(hof/fused ${tHof / tFused}%5.1fx) lsh_pairs=$tLsh%6.2f s pairs=$pairs%d")
      (d, tFused, tHof, tLsh)
    }
    results.headOption.foreach { case (d1, f1, h1, l1) =>
      results.tail.foreach { case (d, f, h, l) =>
        val r = d.toDouble / d1
        println(f"[dim] $d1%d -> $d%d (${r}%.0fx width): fused ${f / f1}%5.1fx " +
          f"hof ${h / h1}%5.1fx lsh ${l / l1}%5.1fx  (linear = ${r}%.0fx, quadratic = ${r * r}%.0fx)")
      }
    }
  }

  /** SemDeDup k-scaling probe: at FIXED k the within-cluster self-join's
    * candidate volume is ~n²/k — super-linear in the corpus (the sf1
    * probe measured exponent 1.67 on the real query) — while the
    * auto-sized default k = ceil(n/targetClusterRows) pins per-cluster
    * volume at ~targetRows²/2 and should scale ~linearly. Times both
    * arms over synthetic embeddings and prints per-step exponents; the
    * fixed arm stops after two sizes (its quadratic term makes larger
    * corpora pointlessly slow to measure).
    */
  private def semProbe(spark: SparkSession, sizes: Seq[Long]): Unit = {
    def synth(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"), synthVec(col("id")).as("embedding"))
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = body; ((System.nanoTime() - t0) / 1e9, r)
    }
    locally { // warm JIT/codegen
      graft.llm.Dedup.semanticNearDupPairs(synth(2000), "vec_id", "embedding",
        threshold = 0.8, maxIters = 4).count()
      dropPinned(spark)
    }
    var prev: Map[String, (Long, Double)] = Map.empty
    sizes.zipWithIndex.foreach { case (n, i) =>
      val corpus = synth(n).localCheckpoint()
      corpus.count()
      // r=2048 stays on the exact-Lloyd arm at these sizes (k ≤ 147);
      // r=256 crosses the SemanticTwoLevelGate at n ≥ 66k, so its later
      // steps measure the two-level assignment path (n·2√k)
      val arms: Seq[(String, (Int, Long))] =
        (if (i < 2) Seq("fixed k=8" -> ((8, 2048L))) else Nil) ++
          Seq("auto r=2048" -> ((graft.llm.Dedup.AutoSize, 2048L)),
            "auto r=256" -> ((graft.llm.Dedup.AutoSize, 256L)))
      arms.foreach { case (label, (k, rows)) =>
        val (t, pairs) = timed(
          graft.llm.Dedup.semanticNearDupPairs(corpus, "vec_id", "embedding",
            threshold = 0.8, k = k, maxIters = 4, targetClusterRows = rows).count())
        val exp = prev.get(label).map { case (n0, t0) =>
          f" exp=${math.log(t / t0) / math.log(n.toDouble / n0)}%.2f"
        }.getOrElse("")
        println(f"[sem] n=$n%d $label%-10s ${t}%8.1f s  pairs=$pairs%d$exp")
        prev += label -> (n, t)
      }
      dropPinned(spark)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.exists(_.startsWith("dim"))) {
      val ds = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(64, 768))
      dimProbe(spark, ds, n = 20000L)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("wprobe"))) {
      val ps = args.head.split(":").lift(1).map(_.split(",").map(_.toLong).toSeq)
      wProbeRecall(spark,
        ps.flatMap(_.headOption).getOrElse(65536L).toInt,
        ps.flatMap(_.lift(1)).getOrElse(1000000L),
        Seq(1, 2, 4, 8, 16))
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("sem"))) {
      val sizes = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toLong).toSeq)
        .getOrElse(Seq(10000L, 30000L, 100000L))
      semProbe(spark, sizes)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("route"))) {
      val sizes = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(1024, 4096, 16384, 65536, 262144))
      routeProbe(spark, sizes)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("prop"))) {
      val sizes = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toLong).toSeq)
        .getOrElse(Seq(1000000L, 3000000L, 10000000L))
      propProbe(spark, sizes)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("loghist"))) {
      val ns = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(200, 1000, 5000))
      logHistProbe(ns)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("cdc"))) {
      val ks = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(4, 16, 64))
      cdcProbe(spark, ks)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("rebal"))) {
      val ps = args.head.split(":").lift(1).map(_.split(",").map(_.toLong).toSeq)
      rebalProbe(spark, ps.flatMap(_.headOption).getOrElse(100000L),
        ps.flatMap(_.lift(1)).getOrElse(10L).toInt)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("stream"))) {
      val combos = args.head.split(":").lift(1)
        .map(_.split(",").toSeq.map { c => val Array(a, b) = c.split("x"); (a.toInt, b.toInt) })
        .getOrElse(Seq((1, 100000), (4, 100000), (16, 100000), (4, 10000), (4, 1000000)))
      streamProbe(spark, combos)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("search"))) {
      val ks = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(10, 30, 100))
      searchProbe(spark, ks)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("annbig"))) {
      val sizes = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toLong).toSeq)
        .getOrElse(Seq(1000000L, 3000000L, 10000000L))
      annBigProbe(spark, sizes)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("ann"))) {
      val ks = args.head.split(":").lift(1)
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(10, 30, 100))
      annProbe(spark, ks)
      spark.stop()
      return
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    chain(scaled(base, 1)) // warm JIT/codegen outside the measured runs
    val ks = args.headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 3, 10))
    val results = ks.map { k =>
      val docs = scaled(base, k).localCheckpoint() // input materialized OUTSIDE the timing
      val rows = docs.count()
      val t0 = System.nanoTime()
      val (n, nPairs) = chain(docs)
      val dt = (System.nanoTime() - t0) / 1e9
      dropPinned(spark)
      println(f"k=$k%2d rows=$rows%8d dup_pairs=$nPairs%8d curated=$n%8d time=$dt%7.2f s")
      (k, rows, nPairs, n, dt)
    }
    val t1 = results.head._5
    results.tail.foreach { case (k, _, _, _, dt) =>
      val exp = math.log(dt / t1) / math.log(k.toDouble / results.head._1)
      println(f"scaling exponent ${results.head._1}x -> ${k}x: $exp%.2f (1.0 = linear)")
    }
    spark.stop()
  }
}
