package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{EngineConfig, TableConfig}
import graft.sink.Ingest
import graft.table.IceTable

/** Plan-shape assertions (the 100 TB story): filters reach the parquet
  * scan, small dimensions broadcast, and offset/VTTS bookkeeping rides
  * the commit.
  */
class PlanAndOffsetsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q3 plan: predicate pushdown into the scan + broadcast of the dimension side") {
    val plan = SparkEntry.queries("q3_topn")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"), s"no pushed filter in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "dimension join is not broadcast")
  }

  test("q3/q5 plans: lineitem⋈orders is the ONLY non-broadcast join") {
    // every dimension (customer/nation/region) must broadcast; the single
    // permitted shuffle join is the two-big-table lineitem⋈orders edge —
    // one more shuffle join means a dimension lost its broadcast hint
    for (q <- Seq("q3_topn", "q5_region")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val shuffleJoins = plan.linesIterator.count(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(shuffleJoins <= 1, s"$q has $shuffleJoins shuffle joins:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"$q broadcasts no dimension:\n$plan")
    }
  }

  test("q1 plan: scan prunes to the referenced columns only") {
    val plan = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // lineitem has 11 columns; the ReadSchema must only carry the 6 used
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"))
  }

  test("kafka-shaped batches commit next-offsets and VTTS (S2/K4/K11)") {
    val wh = TestSpark.freshDir("offsets-wh")
    val cfg = EngineConfig(warehouse = wh, tables = Seq(TableConfig("t")), autoCreate = true)
    val batch = Seq(
      ("t", 0, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      ("t", 0, 11L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "b"),
      ("t", 1, 7L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), "c")
    ).toDF("topic", "partition", "offset", "timestamp", "value")
    Ingest.run(spark, batch, 0L, cfg)
    val c = IceTable.load(s"$wh/t").log.commits().head
    // next-to-consume = max+1 per partition (Worker.save:89-101)
    assert(c.offsets === Map("t-0" -> 12L, "t-1" -> 8L))
    // vtts = min over partitions of max ts (CommitState.vtts:155-178)
    val expected = java.sql.Timestamp.valueOf("2024-01-01 10:02:00").getTime * 1000L
    assert(c.vtts === Some(expected))
  }

  test("append commit runs ONE Spark job: bookkeeping rides the write via observe (K4)") {
    val wh = TestSpark.freshDir("one-job")
    val cfg = EngineConfig(warehouse = wh, tables = Seq(TableConfig("t")), autoCreate = true)
    val batch = Seq(
      ("t", 0, 5L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      ("t", 1, 6L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "b")
    ).toDF("topic", "partition", "offset", "timestamp", "value")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // listener events are async: settle = no count change for 500 ms
    def settle(): Int = {
      var last = -1
      var cur = jobs.get()
      while (cur != last) { last = cur; Thread.sleep(500); cur = jobs.get() }
      cur
    }
    settle() // flush pending events from earlier tests
    spark.sparkContext.addSparkListener(listener)
    try {
      jobs.set(0)
      Ingest.run(spark, batch, 0L, cfg)
      val n = settle()
      assert(n === 1, s"append commit ran $n jobs, expected 1")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the single job still produced correct bookkeeping
    val c = IceTable.load(s"$wh/t").log.commits().head
    assert(c.offsets === Map("t-0" -> 6L, "t-1" -> 7L))
  }

  test("CDC read-back applies equality deletes as a broadcast anti-join (D2 plan shape)") {
    val wh = TestSpark.freshDir("plan-cdc")
    val cfg = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("t", idColumns = Seq("id"))),
      cdcField = Some("op"), autoCreate = true)
    val b0 = Seq((1L, "a", "I", 0L), (2L, "b", "I", 1L)).toDF("id", "v", "op", "offset")
    val b1 = Seq((1L, "a2", "U", 2L)).toDF("id", "v", "op", "offset")
    Ingest.run(spark, b0, 0L, cfg)
    Ingest.run(spark, b1, 1L, cfg)
    val plan = IceTable.load(s"$wh/t").read(spark).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"deletes not applied as broadcast anti-join:\n$plan")
  }

  test("sampling and text ops stay map-side: no exchange in the plan") {
    for (q <- Seq("sample_hash", "text_normalize", "text_redact_pii", "text_repetition")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // a single global sort for the ordered output is expected; nothing
      // else may shuffle — these are scan-speed filters/projections
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n$plan")
    }
  }

  test("mongo CDC flattening stays map-side: patch merge is pure projection") {
    // the envelope → typed-payload reconstruction (image selection, patch
    // coalesce, removed-field nulling) must compile to column expressions
    // over one scan — only the final ordered-output sort may shuffle.
    // (Schema inference runs as separate bounded driver-side jobs and is
    // not part of this plan.)
    val plan = SparkEntry.queries("transform_mongo_cdc")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"transform_mongo_cdc has $exchanges exchanges:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"),
      s"non-codegen eval in mongo cdc plan:\n$plan")
  }

  test("chunking and quantization stay map-side: no exchange in the plan") {
    for (q <- Seq("chunk_documents", "embed_quantize")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // one global sort for the ordered output; the operator itself is a
      // codegen'd explode that must not shuffle
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"$q has $exchanges exchanges:\n$plan")
    }
  }

  test("embed_centroids aggregates partially before its one shuffle") {
    val plan = SparkEntry.queries("embed_centroids")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"centroid mean is not map-side combined:\n$plan")
  }

  test("incremental index probes broadcast the batch side — the corpus never shuffles") {
    // Two accepted shapes, same invariant (batch side broadcast, nothing
    // corpus-sized ever shuffles):
    //  - bucket-probe path (r13 candidate-count gate): the bucket join
    //    materializes into the candidates checkpoint and BOTH visible
    //    verify joins are broadcast hash joins;
    //  - degenerate-geometry cross-verify (r16, EmbIndex on a
    //    low-threshold index whose sizing cannot prune): ONE
    //    BroadcastNestedLoopJoin with the BATCH side as the broadcast
    //    build — the corpus is scanned once, shuffle-free.
    for (q <- Seq("dedup_incremental", "dedup_embedding_incremental")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val hashBroadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val crossVerify = plan.contains("BroadcastNestedLoopJoin BuildRight")
      assert(hashBroadcasts >= 2 || crossVerify,
        s"$q: expected >=2 broadcast hash joins or a batch-broadcast " +
          s"cross-verify, got $hashBroadcasts:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q: a corpus-sized side regressed to a shuffle join:\n$plan")
    }
  }

  test("sample_topk pre-prunes each partition via WindowGroupLimit") {
    val plan = SparkEntry.queries("sample_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not trigger the map-side group limit:\n$plan")
  }

  test("sample_exact_k pre-prunes via WindowGroupLimit like sample_topk") {
    val plan = SparkEntry.queries("sample_exact_k")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"hash-order rank filter did not trigger the map-side group limit:\n$plan")
  }

  test("sample_budget: one per-stratum window shuffle plus the output sort, nothing else") {
    val plan = SparkEntry.queries("sample_budget")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"running-sum window missing:\n$plan")
    // partitioned window: the running sum must NOT collapse to one task —
    // the window's exchange has to hash on the stratum column
    assert(plan.contains("hashpartitioning(source"),
      s"budget window lost its stratum partitioning:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"sample_budget has $exchanges exchanges:\n$plan")
  }

  test("mix_rebalance is a pure map-side filter once rates are compiled") {
    val plan = SparkEntry.queries("mix_rebalance")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // one global sort for the ordered output; the selection itself is a
    // codegen'd CASE threshold directly above the scan
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"mix_rebalance has $exchanges exchanges:\n$plan")
    assert(!plan.contains("Join"), s"rate lookup leaked a join into the plan:\n$plan")
  }

  test("decontaminate_bloom: the Bloom predicate prunes the corpus before any join") {
    val df = SparkEntry.queries("decontaminate_bloom")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"Bloom probe predicate missing:\n$plan")
  }

  test("dedup_spans stays linear: hash/merge joins only, partial aggregation present") {
    val plan = SparkEntry.queries("dedup_spans")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"span dedup degenerated to a product join:\n$plan")
    assert(plan.contains("partial"), s"span aggregation is not map-side combined:\n$plan")
  }

  test("range_join plans as a hash join on buckets, never a nested loop") {
    val plan = SparkEntry.queries("range_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join"), s"no join in plan:\n$plan")
  }

  test("asof_join runs on ONE key shuffle for the window carry") {
    val plan = SparkEntry.queries("asof_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // expected exchanges: click-dedup groupBy, the window's key partition,
    // and the output sort — anything more means the union re-shuffled
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3, s"asof join shuffles $exchanges times:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in asof plan:\n$plan")
  }

  test("asof variants keep the single-shuffle shape of the base operator") {
    for (q <- Seq("asof_forward", "asof_tolerance")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 3, s"$q shuffles $exchanges times:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in $q plan:\n$plan")
    }
  }

  test("agg_rollup expands once into a single partially-aggregated pass") {
    val plan = SparkEntry.queries("agg_rollup")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup without Expand (multi-scan?):\n$plan")
    assert(plan.linesIterator.count(_.contains("Expand")) == 1, s"rollup expanded twice:\n$plan")
    // one agg shuffle + the output sort, never one scan per grouping set
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"rollup shuffles $exchanges times:\n$plan")
  }

  test("propagate_scores: every round materializes eagerly — the constant-depth contract") {
    val nodes = (1L to 50L).map(i => (i, i * 1000L)).toDF("id", "s0_micros")
    val edges = (1L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // The returned Dataset is checkpoint-flat by construction, so plan
    // INSPECTION alone cannot tell per-round checkpointing from
    // final-only checkpointing (the regression that would replan a
    // rounds-deep join chain every round). Count eager jobs instead:
    // dirDeg + base + one checkpoint job per round must all run DURING
    // the call — final-only checkpointing would run ~3 jobs, not >= 7.
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    val result =
      try {
        val r = graft.llm.Propagate.propagateScores(nodes, edges, rounds = 5)
        val deadline = System.nanoTime() + 10L * 1000000000L
        while (jobs < 7 && System.nanoTime() < deadline) Thread.sleep(50)
        r
      } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs >= 7, s"expected >= 7 eager jobs (dirDeg + base + 5 rounds), saw $jobs")
    // and the returned plan is the flat materialized scan, not a live chain
    val lines = result.queryExecution.executedPlan.toString.linesIterator.size
    assert(lines <= 6, s"returned plan is not checkpoint-flat ($lines lines)")
  }

  test("agg_collect (salted) keeps uniform first-stage keys: two exchanges, no window") {
    val plan = SparkEntry.queries("agg_collect")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    // (key,salt) agg + key agg + output sort
    assert(exchanges <= 3, s"salted collect shuffles $exchanges times:\n$plan")
    assert(!plan.contains("Window"), s"salted collect must not plan a window:\n$plan")
  }

  test("route_dead_letter stays map-side: both slices are filters over one scan shape") {
    val plan = SparkEntry.queries("route_dead_letter")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the union of the two filtered slices needs no shuffle; only the
    // output sort exchanges
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"dead-letter split shuffles $exchanges times:\n$plan")
  }

  test("decontaminate broadcasts the benchmark index — the corpus side never shuffles for the join") {
    val plan = SparkEntry.queries("decontaminate")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark index not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the benchmark join:\n$plan")
  }

  test("bm25 and ngram_counts rank via TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("search_bm25", "ngram_counts")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q top-k is not per-partition-heap + driver merge:\n$plan")
    }
  }

  test("pack_sequences runs on ONE shard shuffle plus the output sort") {
    val plan = SparkEntry.queries("pack_sequences")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"packing shuffles $exchanges times:\n$plan")
  }

  test("corpus_stats aggregates partially before its one shuffle") {
    val plan = SparkEntry.queries("corpus_stats")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"no partial aggregation in plan:\n$plan")
    // documents has 5 columns; the scan must not read doc_id
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("doc_id"), s"scan reads pruned column:\n$read")
  }

  test("VTTS is null when an ASSIGNED partition is silent (CommitState.vtts:155-178)") {
    val batch = Seq(
      ("t", 0, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a")
    ).toDF("topic", "partition", "offset", "timestamp", "value")
    // t-1 is assigned but sent nothing: it may still hold unread data older
    // than every observed timestamp, so the watermark cannot advance
    val wh = TestSpark.freshDir("vtts-silent")
    val cfg = EngineConfig(warehouse = wh, tables = Seq(TableConfig("t")), autoCreate = true)
    Ingest.run(spark, batch, 0L, cfg, assignedPartitions = Set("t-0", "t-1"))
    val c = IceTable.load(s"$wh/t").log.commits().head
    assert(c.vtts === None)
    assert(c.offsets === Map("t-0" -> 2L)) // offsets still advance for observed partitions
    // full assignment present → min-of-max watermark as usual
    val wh2 = TestSpark.freshDir("vtts-silent2")
    Ingest.run(spark, batch, 0L, cfg.copy(warehouse = wh2), assignedPartitions = Set("t-0"))
    val c2 = IceTable.load(s"$wh2/t").log.commits().head
    assert(c2.vtts === Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L))
  }

  test("VTTS is null when a partition has no timestamp (CommitState.vtts null case)") {
    val wh = TestSpark.freshDir("vtts-null")
    val cfg = EngineConfig(warehouse = wh, tables = Seq(TableConfig("t")), autoCreate = true)
    val batch = Seq(
      ("t", 0, 1L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), "a"),
      ("t", 1, 2L, None, "b")
    ).toDF("topic", "partition", "offset", "timestamp", "value")
    Ingest.run(spark, batch, 0L, cfg)
    val c = IceTable.load(s"$wh/t").log.commits().head
    assert(c.vtts === None)
    assert(c.offsets === Map("t-0" -> 2L, "t-1" -> 3L))
  }

  test("offsets_agg accepts DECIMAL offsets/timestamps (Decimal is not a java.lang.Number)") {
    // the common unsigned-bigint CDC mapping is DECIMAL(20,0): it passes
    // the NumericType analysis gate, so the runtime read must handle
    // Spark's Decimal (which does NOT implement java.lang.Number) —
    // pre-fix this crashed per-row with an opaque ClassCastException
    val df = Seq(("t", 0, BigDecimal(10), BigDecimal(123)), ("t", 0, BigDecimal(11), BigDecimal(456)))
      .toDF("topic", "partition", "offset", "ts")
    val r = df
      .agg(graft.functions.OffsetsAgg(col("topic"), col("partition"), col("offset"), col("ts")).as("m"))
      .selectExpr("m['t-0'].max_offset", "m['t-0'].max_ts").head()
    assert(r.getLong(0) === 11L)
    assert(r.getLong(1) === 456L)
  }
}
