package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.{Dedup, EmbIndex}
import graft.operators.HotPath.Pinnable

/** Exactly-once streaming EMBEDDING dedup over a persisted hyperplane-LSH
  * index — the vector twin of [[DedupStream]] (same shell, same replay
  * story, [[EmbIndex]] instead of LshIndex):
  *
  * each micro-batch
  *  1. drops vectors near-duplicating the INDEXED corpus
  *     ([[EmbIndex.queryBatch]] — broadcast signature probe, exact-cosine
  *     verified, no corpus rescan), probing at the index's own
  *     bits/tables so stored and in-flight signatures agree;
  *  2. resolves WITHIN-batch duplicates with the in-session pair search
  *     at the same signature parameters + connected components
  *     (component-min id survives);
  *  3. folds the survivors into the index IDEMPOTENTLY
  *     ([[EmbIndex.appendBatch]] — delete-then-write of this batch's
  *     partition, so Spark's failure replay REPLACES the partition);
  *  4. hands the survivors to `sink(df, batchId)` — pair it with a
  *     batchId-fenced writer and the pipeline is exactly-once end to end.
  *
  * The replay guard mirrors DedupStream's: the cross-probe EXCLUDES this
  * batch id's own index partition, so a replay (first attempt died after
  * its appendBatch) cannot self-match its survivors at cosine 1 and sink
  * an empty batch — silent data loss.
  *
  * Degenerate vectors (null/empty/zero/NaN — no direction, cosine can
  * never verify) pass through as survivors but are never indexed, the
  * same pass-through [[DedupStream]] gives sub-n-token docs.
  *
  * 100 TB shape: per batch, cost is the batch's own signature pass, one
  * broadcast probe of the bucket index, and a batch-local pair search —
  * the corpus is never rescanned or shuffled.
  */
object EmbDedupStream {


  def start(
      source: DataFrame,
      indexDir: String,
      idCol: String,
      vecCol: String,
      threshold: Double,
      checkpointLocation: String,
      sink: (DataFrame, Long) => Unit,
      triggerMs: Long = 1000L,
      /** In-stream index maintenance — every N batches fold aged
        * partitions into the base; same contract and placement as
        * [[DedupStream]]'s parameter of the same name. */
      compactEveryBatches: Option[Long] = None
  ): StreamingQuery = {
    compactEveryBatches.foreach(e =>
      require(e > 0, s"compactEveryBatches must be > 0: $e"))
    // immutable signature parameters — read once, not per trigger (the
    // cached compaction watermark is safe: compact only folds batches
    // below this stream's own committed checkpoint)
    val meta = EmbIndex.readMeta(source.sparkSession, indexDir)
    source.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // pin() = localCheckpoint by default; batch-replay recovery story
        // and the reliable-checkpoint knob: see DedupStream's note and
        // HotPath's scaladoc.
        val b = batch.pin() // scanned by cross-probe, pair search, anti-joins
        // 1. cross-batch, excluding this batch's own prior index partition
        val crossDup = EmbIndex.queryBatchWith(spark, indexDir, b, idCol, vecCol,
          threshold, excludeBatch = Some(batchId), meta)
          .select(col("id_new").as("__dup_id")).distinct()
          // dup ids only (tiny) — unmaterialized, the index probe
          // (bucket read + signature join + cosine verify) re-executes
          // in every downstream job of the trigger
          .pin()
        val afterCross = b.join(crossDup,
          b(idCol).cast("long") === col("__dup_id"), "left_anti")
        // 2. within-batch at the index's parameters; losers = every
        // component member except the min id
        val pairs = Dedup.embeddingNearDupPairs(afterCross, idCol, vecCol, threshold,
          // dim pinned to the index's width: a degenerate (null/empty)
          // leading vector in the batch must not re-detect a narrower
          // plane set than the signatures the index was built with
          lshBits = meta.bits, lshTables = meta.tables, dim0 = meta.dim)
        val losers = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
          .filter(col("id") =!= col("group_id"))
          .select(col("id").as("__loser_id"))
          // same rule DedupStream applies: unmaterialized, the whole
          // hyperplane pair search re-runs for the index fold AND the sink
          .pin()
        val survivors = afterCross.join(losers,
          afterCross(idCol).cast("long") === col("__loser_id"), "left_anti")
          .pin() // feeds the index fold AND the sink
        // 3. replay-safe index fold, THEN 4. the (batchId-fenced) sink
        EmbIndex.appendBatchWith(spark, indexDir, survivors, idCol, vecCol, batchId, meta)
        sink(survivors, batchId)
        // 5. in-stream maintenance between this trigger's probe and the
        // next trigger's planning — no probe can be mid-scan over a
        // partition the fold deletes (see DedupStream)
        compactEveryBatches.foreach { every =>
          if (batchId > 0 && batchId % every == 0)
            // same guard as DedupStream: compaction is an optimization;
            // its failure must not wedge the stream (loud WARN, retried
            // at the next multiple)
            graft.fs.SweepAlarm.guarded(s"in-stream index compaction at $indexDir",
              s"batch $batchId's dedup output stands; the fold retries later") {
              EmbIndex.compact(spark, indexDir, upToBatch = batchId - 1)
              ()
            }
        }
      }
      .start()
  }
}
