package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.{Dedup, LshIndex}
import graft.operators.HotPath.Pinnable

/** Exactly-once streaming corpus dedup over a persisted LSH index — the
  * "continuously curate arriving crawls" pipeline:
  *
  * each micro-batch
  *  1. drops documents near-duplicating the INDEXED corpus
  *     ([[LshIndex.queryBatch]] — broadcast bucket probe, exact-Jaccard
  *     verified, no corpus rescan),
  *  2. resolves WITHIN-batch duplicates with the in-session pair search
  *     at the index's own signature parameters + connected components
  *     (component-min id survives),
  *  3. folds the survivors into the index IDEMPOTENTLY
  *     ([[LshIndex.appendBatch]] — the micro-batch id keys a dynamic
  *     partition overwrite, so Spark's failure replay rewrites the same
  *     partition instead of duplicating index rows),
  *  4. hands the survivors to `sink(df, batchId)` — pair it with a
  *     batchId-fenced writer ([[graft.sink.Ingest.run]] / the IceTable
  *     commit-log replay guard) and the whole pipeline is exactly-once
  *     end to end.
  *
  * 100 TB shape: per batch, cost is the batch's own shingle pass, one
  * broadcast probe of the bucket index, and a batch-local pair search —
  * the corpus is never rescanned, reshingled, or shuffled.
  */
object DedupStream {


  def start(
      source: DataFrame,
      indexDir: String,
      idCol: String,
      textCol: String,
      threshold: Double,
      checkpointLocation: String,
      sink: (DataFrame, Long) => Unit,
      triggerMs: Long = 1000L,
      /** In-stream index maintenance: every N batches, fold the aged
        * `batch=<b>` partitions (b ≤ batchId-1 — strictly below anything
        * Spark can still replay, the [[LshIndex.compact]] contract) into
        * the index's base partition, bounding the partition count a
        * long-running stream accumulates. Running from the stream's OWN
        * hook (between this trigger's probe and the next trigger's
        * planning) is exactly the placement compact's concurrency note
        * calls for: no probe can be mid-scan over a partition the fold
        * deletes. None = external maintenance. */
      compactEveryBatches: Option[Long] = None
  ): StreamingQuery = {
    compactEveryBatches.foreach(e =>
      require(e > 0, s"compactEveryBatches must be > 0: $e"))
    // the index's signature parameters are immutable — read once, not
    // three Spark jobs per trigger (the cached compaction watermark is
    // safe: compact only folds batches below this stream's own committed
    // checkpoint, never one it could still replay)
    val meta = LshIndex.readMeta(source.sparkSession, indexDir)
    source.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Every pin() below materializes a multi-consumer frame once
        // (default localCheckpoint — lineage truncated). Safe HERE
        // because a lost executor fails the attempt and the stream
        // replays the SAME batch, fenced exactly-once by the probe's
        // excludeBatch guard + the index fold's partition overwrite +
        // the sink's batchId fence; cost is a batch retry, not wrong
        // data. High-churn clusters: see HotPath.ReliableConf.
        val b = batch.pin() // scanned by cross-probe, pair search, anti-joins
        // ONE shingle pass per trigger: the materialized (id, shset)
        // frame feeds the cross-probe, the within-batch pair search, and
        // the index fold — the shingle expression is the batch's
        // dominant map-side cost and used to run three times
        val sets = LshIndex.shingleSets(b, idCol, textCol, meta.n).pin()
        // 1. cross-batch: anything near-duplicating the indexed corpus
        // goes. The probe EXCLUDES this batch id's own index partition:
        // on a replay (first attempt died after its appendBatch), the
        // survivors would otherwise self-match at Jaccard 1 and the
        // replay would sink an empty batch — silent data loss.
        val crossDup = LshIndex.queryBatchWith(spark, indexDir, b, idCol, textCol,
          threshold, excludeBatch = Some(batchId), meta, preSets = Some(sets))
          .select(col("id_new").as("__dup_id")).distinct()
          // dup ids only (tiny) — unmaterialized, the index probe (bucket
          // parquet read + join) re-executes in THREE jobs per trigger:
          // losers' checkpoint, survivors' checkpoint, and the index fold
          .pin()
        val afterCross = b.join(crossDup,
          b(idCol).cast("long") === col("__dup_id"), "left_anti")
        val setsAfterCross = sets.join(crossDup,
          col("id") === col("__dup_id"), "left_anti")
        // 2. within-batch: same signature parameters as the index, losers =
        // every component member except the min id
        // group-shaped consumer: a giant duplicate group arriving in one
        // batch emits star edges past GroupMaxBucket instead of a
        // quadratic candidate set (r17 skew sweep; components unchanged
        // for true near-dup groups)
        val pairs = Dedup.minhashLshPairsFromSets(setsAfterCross,
          numHashes = meta.numHashes, bands = meta.bands, threshold = threshold,
          maxBucket = Dedup.GroupMaxBucket)
        val losers = Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("group_id"))
          .select(col("id").as("__loser_id"))
          .pin() // filters the batch AND its shingle frame
        val survivors = afterCross.join(losers,
          afterCross(idCol).cast("long") === col("__loser_id"), "left_anti")
          .pin() // feeds the index fold AND the sink
        val setsSurvivors = setsAfterCross.join(losers,
          col("id") === col("__loser_id"), "left_anti")
        // 3. replay-safe index fold (delete-then-write of this batch's
        // partition), THEN 4. the (batchId-fenced) sink
        LshIndex.appendBatchWith(spark, indexDir, survivors, idCol, textCol, batchId, meta,
          preSets = Some(setsSurvivors))
        sink(survivors, batchId)
        // 5. in-stream maintenance (see the parameter doc). The cached
        // `meta` stays valid: compact never touches signature params or
        // the generation, and its advanced watermark only affects batch
        // ids this stream has already committed past.
        compactEveryBatches.foreach { every =>
          if (batchId > 0 && batchId % every == 0)
            // compaction is an optimization riding an already-published
            // dedup batch — absorb its failure (loud) rather than wedge
            // the stream in a restart loop; the fold retries at the next
            // multiple (same rule as IngestStream's maintenance guard)
            graft.fs.SweepAlarm.guarded(s"in-stream index compaction at $indexDir",
              s"batch $batchId's dedup output stands; the fold retries later") {
              LshIndex.compact(spark, indexDir, upToBatch = batchId - 1)
              ()
            }
        }
      }
      .start()
  }
}
