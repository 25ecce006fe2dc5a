package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.EngineConfig
import graft.table.IceTable

/** Bounded SOAK (r17 verdict item 3): the kitchen-sink deployment shape
  * — dynamic route + auto-create + CDC + DLQ + mid-stream evolution +
  * in-stream maintenance — run for 200+ triggers with a SEEDED random
  * op mix, crash/restart injections at random triggers, fsck asserted
  * green every 25 triggers, and a final exactly-once reconciliation of
  * every table against a driver-side input LEDGER. Duration is what
  * exposes slow leaks and deep-history interactions a 4-trigger test
  * structurally cannot (the commit-log checkpoint + retention chain at
  * 200+ commits, state accumulating across incarnations), so the suite
  * also asserts FLATNESS: per-trigger latency in the last quartile stays
  * within bounds of the first, and driver heap (post-GC) does not grow
  * past a leak-sized bound across the run.
  *
  * r18 (verdict item 5 — soak × SKEW): the same kitchen-sink soak runs a
  * second arm whose op mix has the skew fixture's shape (52% of traffic
  * on one route, a CDC key taking 25% of that table's mutations, a hot
  * buys key) — the one interaction (skew × long horizon × state/commit
  * stores) the one-shot skew sweep could not measure — plus a near-dup-
  * HEAVY [[DedupStream]] soak: 70% of 120 triggers' documents near-
  * duplicate one hot template, asserting the index grows with SURVIVORS
  * (bounded) rather than arrivals, exactly-once curation against a
  * driver ledger, and the same latency flatness.
  *
  * Runtime budget: well under 10 min for the suite (one command:
  * `sbt "testOnly graft.streaming.SoakSuite"`).
  */
class SoakSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Triggers = 220
  private val FsckEvery = 25

  /** One kitchen-sink soak arm. `mixSel` picks the op class (the codes of
    * the original uniform arm: 0-2 clicks upsert, 3 clicks delete, 4
    * clicks poison, 5-7 views append, 8-9 buys upsert); `clickKey` /
    * `buyKey` pick CDC keys — the skew arm concentrates both.
    */
  private def kitchenSinkSoak(
      label: String,
      seed: Int,
      mixSel: scala.util.Random => Int,
      clickKey: scala.util.Random => Long,
      buyKey: scala.util.Random => Long): Unit = {
    implicit val sq = spark.sqlContext
    val wh = TestSpark.freshDir(s"soak-$label-wh")
    val ckpt = TestSpark.freshDir(s"soak-$label-ckpt")
    val rnd = new scala.util.Random(seed)
    val cfg = EngineConfig(warehouse = wh,
      routeField = Some("event_type"), dynamicRouting = true,
      cdcField = Some("op"), autoCreate = true, evolveSchema = true,
      deadLetterEnabled = true, defaultIdColumns = Seq("event_id"))
    // clicks pre-created typed (value DOUBLE) so poison values dead-letter
    IceTable.create(s"$wh/clicks", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))),
      graft.table.TableMeta(idColumns = Seq("event_id")))

    // ---- driver-side ledger: the EXPECTED final state, maintained by
    // applying each record's semantics in input order (CDC last-wins per
    // key; appends are multisets; poison rows count toward the DLQ)
    val clicksState = scala.collection.mutable.Map.empty[Long, (Double, Option[Long])]
    val buysState = scala.collection.mutable.Map.empty[Long, String]
    val viewsIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dlqCount = 0L

    def j(id: Long, t: String, op: String, v: String, w: Option[Long]): String =
      s"""{"event_id":$id,"event_type":"$t","op":"$op","value":$v""" +
        w.map(x => s""","w":$x}""").getOrElse("}")

    // one random record, applied to the ledger and rendered as input JSON.
    // `withW` gates the evolved column (switched on mid-run). `usedKeys`
    // keeps each CDC key to AT MOST ONE mutation per batch: two ops on one
    // key inside a batch would make the expected state depend on
    // within-batch tie-break order, which is not what this suite pins
    // (CdcOpsSuite owns that); a collision degrades to a views append.
    // Under the skew arm the HOT key collides constantly — exactly the
    // point: the stream still sees a hot-key-dominated mutation feed.
    def record(withW: Boolean, usedKeys: scala.collection.mutable.Set[String]): String = {
      val w = if (withW) Some(rnd.nextInt(100).toLong) else None
      def viewsAppend(): String = {
        val id = viewsIds.size.toLong
        viewsIds += id
        j(id, "views", "I", "\"a\"", w)
      }
      mixSel(rnd) match {
        case 0 | 1 | 2 => // clicks upsert (insert when the key is absent)
          val id = clickKey(rnd)
          val v = math.round(rnd.nextDouble() * 1000) / 10.0
          if (!usedKeys.add(s"clicks/$id")) viewsAppend()
          else { clicksState(id) = (v, w); j(id, "clicks", "U", s""""$v"""", w) }
        case 3 => // clicks delete (of a possibly-absent key — a no-op then)
          val id = clickKey(rnd)
          if (!usedKeys.add(s"clicks/$id")) viewsAppend()
          else { clicksState.remove(id); j(id, "clicks", "D", "\"0\"", w) }
        case 4 => // clicks poison: uncoercible value dead-letters
          val id = clickKey(rnd)
          if (!usedKeys.add(s"clicks/$id")) viewsAppend()
          else { dlqCount += 1; j(id, "clicks", "I", "\"poison\"", w) }
        case 5 | 6 | 7 => viewsAppend() // ids unique per row
        case _ => // buys upsert (string-typed value column, auto-created)
          val id = buyKey(rnd)
          val v = s"v${rnd.nextInt(1000)}"
          if (!usedKeys.add(s"buys/$id")) viewsAppend()
          else { buysState(id) = v; j(id, "buys", "U", s""""$v"""", w) }
      }
    }

    val ms = MemoryStream[String]
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val crashOnce: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { d =>
      if (crashArmed.compareAndSet(true, false))
        throw new RuntimeException("soak: injected crash")
      d
    }
    def start() = IngestStream.start(ms.toDF(), cfg, ckpt,
      transforms = Seq(crashOnce, graft.transforms.Transforms.jsonExpand("value")),
      triggerMs = Some(10), maintenanceDeltaCommits = Some(8))

    def existingTables(): Seq[String] =
      Seq("clicks", "views", "buys", "clicks__dlq")
        .filter(t => graft.fs.ControlFs.listNames(s"$wh/$t").nonEmpty)

    def heapAfterGc(): Long = {
      System.gc(); Thread.sleep(50); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }

    val heapStart = heapAfterGc()
    val latencies = scala.collection.mutable.ArrayBuffer.empty[Double]
    var q = start()
    var crashes = 0
    try {
      (0 until Triggers).foreach { i =>
        val evolved = i >= Triggers / 2 // mid-run evolution: `w` appears
        val used = scala.collection.mutable.Set.empty[String]
        val batch = Seq.fill(1 + rnd.nextInt(4))(record(evolved, used))
        // ~4% of triggers: inject a crash, restart, and replay exactly-once
        val crashing = rnd.nextInt(25) == 0
        if (crashing) {
          crashes += 1
          crashArmed.set(true)
          ms.addData(batch)
          intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            q.processAllAvailable()
            q.awaitTermination()
          }
          assert(!crashArmed.get(), "injected crash must have fired")
          q = start() // replay incarnation
          q.processAllAvailable()
        } else {
          val t0 = System.nanoTime()
          ms.addData(batch)
          q.processAllAvailable()
          latencies += (System.nanoTime() - t0) / 1e9
        }
        if ((i + 1) % FsckEvery == 0) {
          existingTables().foreach { t =>
            val bad = IceTable.load(s"$wh/$t").fsck(spark).count()
            assert(bad === 0L, s"fsck found $bad inconsistencies in $t at trigger $i")
          }
        }
      }
    } finally q.stop()
    assert(crashes >= 3, s"the seeded mix must inject several crashes, got $crashes")

    // ---- exactly-once reconciliation against the ledger
    val clicks = IceTable.load(s"$wh/clicks").read(spark)
      .select(col("event_id"), col("value"), col("w"))
      .as[(Long, Double, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(clicks === clicksState.toMap,
      s"clicks state diverged: extra=${clicks.keySet -- clicksState.keySet} " +
        s"missing=${clicksState.keySet -- clicks.keySet}")
    val views = IceTable.load(s"$wh/views").read(spark)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(views === viewsIds.sorted.toSeq, "views appends must be exactly-once")
    val buys = IceTable.load(s"$wh/buys").read(spark)
      .select("event_id", "value").as[(Long, String)].collect().toMap
    assert(buys === buysState.toMap, "buys upsert state diverged")
    assert(IceTable.load(s"$wh/clicks__dlq").read(spark).count() === dlqCount,
      "every poison row dead-letters exactly once")
    // batch ids distinct and increasing in every log — nothing replayed in
    existingTables().foreach { t =>
      val ids = IceTable.load(s"$wh/$t").log.commits().map(_.batchId).filter(_ >= 0)
      assert(ids === ids.distinct.sorted, s"$t replayed batch ids")
    }

    // ---- flatness: latency (last quartile vs first) and post-GC heap.
    // Medians, not means — maintenance triggers legitimately spike.
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val quarter = latencies.size / 4
    val first = median(latencies.take(quarter).toSeq)
    val last = median(latencies.takeRight(quarter).toSeq)
    info(f"[$label] latency first-quartile median ${first}%.3f s, last ${last}%.3f s, " +
      f"triggers ${latencies.size}, crashes $crashes")
    assert(last <= first * 3 + 0.3,
      f"per-trigger latency grew ${last / first}%.1fx across the soak — " +
        "deep-history cost is leaking into the hot path")
    val heapEnd = heapAfterGc()
    val grownMb = (heapEnd - heapStart) / (1 << 20)
    info(s"[$label] post-GC heap growth across soak: ${grownMb} MB")
    assert(grownMb < 600,
      s"driver heap grew ${grownMb} MB across $Triggers triggers — leak-sized")
  }

  test(s"soak: $Triggers kitchen-sink triggers with random crashes — exactly-once " +
    "ledger reconciliation, fsck green throughout, flat latency and heap") {
    kitchenSinkSoak("uniform", seed = 42,
      mixSel = _.nextInt(10),
      clickKey = _.nextInt(40).toLong,
      buyKey = _.nextInt(15).toLong)
  }

  test(s"soak x SKEW (r18): $Triggers triggers with the skew fixture's shape — 52% of " +
    "traffic on one route, a 25%-hot CDC key — same exactly-once, fsck, and flatness bars") {
    kitchenSinkSoak("skew", seed = 4242,
      // zipf-ish route mix: 52% clicks upsert, 6% delete, 4% poison,
      // 25% views, 13% buys (the r17 skew fixture's event_type shape)
      mixSel = { r =>
        val p = r.nextInt(100)
        if (p < 52) 0 else if (p < 58) 3 else if (p < 62) 4 else if (p < 87) 5 else 9
      },
      // hot keys: 25% of clicks mutations hit key 7; 25% of buys hit key 3
      clickKey = r => if (r.nextInt(4) == 0) 7L else r.nextInt(40).toLong,
      buyKey = r => if (r.nextInt(4) == 0) 3L else r.nextInt(15).toLong)
  }

  test("soak x near-dup-HEAVY DedupStream (r18): 120 triggers, 70% of documents " +
    "near-duplicate one hot template — index grows with SURVIVORS, curation " +
    "exactly-once, latency flat") {
    import graft.config.TableConfig
    implicit val sq = spark.sqlContext
    val DedupTriggers = 120
    val indexDir = TestSpark.freshDir("soak-dedup-idx")
    val wh = TestSpark.freshDir("soak-dedup-wh")
    val ckpt = TestSpark.freshDir("soak-dedup-ckpt")
    val rnd = new scala.util.Random(7)
    // seed corpus: one doc, never re-admitted
    val template = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    graft.llm.LshIndex.build(
      Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"),
      "doc_id", "text", indexDir, n = 3, numHashes = 64, bands = 32)
    val cfg = EngineConfig(warehouse = wh, tables = Seq(TableConfig("curated")),
      autoCreate = true)
    val ms = MemoryStream[(Long, String)]
    val q = DedupStream.start(ms.toDF().toDF("doc_id", "text"), indexDir,
      "doc_id", "text", threshold = 0.5, ckpt,
      sink = (df, batchId) => { graft.sink.Ingest.run(spark, df, batchId, cfg); () },
      triggerMs = 20, compactEveryBatches = Some(10))
    // driver-side ledger: hot-template docs (J≈0.9 to each other and to
    // the first-admitted one) — exactly ONE survives across the whole
    // run; novel docs are pairwise disjoint (unique tokens) — all survive
    var nextId = 100L
    var hotSurvivor = -1L
    val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val latencies = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      (0 until DedupTriggers).foreach { i =>
        val batch = (0 until 3).map { _ =>
          val id = nextId; nextId += 1
          if (rnd.nextInt(10) < 7) { // 70%: near-dup of the hot template
            // within the first such batch, the min id wins the component;
            // across batches, the indexed survivor blocks the rest
            if (hotSurvivor < 0) { hotSurvivor = id; expected += id }
            (id, s"$template tail$id")
          } else { // 30%: novel, pairwise disjoint
            expected += id
            (id, s"novel $id alpha$id beta$id gamma$id delta$id epsilon$id zeta$id")
          }
        }
        val t0 = System.nanoTime()
        ms.addData(batch: _*)
        q.processAllAvailable()
        latencies += (System.nanoTime() - t0) / 1e9
        if ((i + 1) % FsckEvery == 0)
          assert(IceTable.load(s"$wh/curated").fsck(spark).count() === 0L,
            s"fsck found inconsistencies in curated at trigger $i")
      }
    } finally q.stop()
    // wrinkle the ledger misses: a batch whose hot docs arrive BEFORE the
    // first hot survivor is indexed but in the SAME batch as it — within-
    // batch components handle that (min id wins, the rest drop), and the
    // ledger's "first hot doc of the first hot batch" is exactly that min.
    val curated = IceTable.load(s"$wh/curated").read(spark)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(curated === expected.sorted.toSeq,
      s"curated diverged: extra=${curated.toSet -- expected.toSet} " +
        s"missing=${expected.toSet -- curated.toSet}")
    // the INDEX grew with survivors, not arrivals: 360 docs arrived, ~70%
    // were hot near-dups — the dup pressure must not accumulate state
    val idxCount = spark.read
      .parquet(s"${graft.llm.LshIndex.dataDir(spark, indexDir)}/shingles.parquet")
      .select("id").distinct().count()
    assert(idxCount === expected.size + 1L, // +1 for the seed corpus doc
      s"index holds $idxCount ids, expected ${expected.size + 1} — " +
        "near-dup arrivals are leaking into the index")
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val quarter = latencies.size / 4
    val first = median(latencies.take(quarter).toSeq)
    val last = median(latencies.takeRight(quarter).toSeq)
    info(f"[dedup-soak] latency first-quartile median $first%.3f s, last $last%.3f s; " +
      f"survivors ${expected.size}/360 arrivals, index ids $idxCount")
    assert(last <= first * 3 + 0.3,
      f"per-trigger dedup latency grew ${last / first}%.1fx across the soak — " +
        "index growth or dup pressure is leaking into the hot path")
  }
}
