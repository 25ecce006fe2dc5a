package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.config.EngineConfig
import graft.sink.Ingest

/** K1-K12 — the streaming shell.
  *
  * The reference's coordinator state machine (commit interval trigger,
  * begin-commit broadcast, readiness barrier, transactional offset commit,
  * replay-on-restart — `channel/Coordinator.java`, `channel/Worker.java`)
  * collapses into Structured Streaming:
  *
  *  - K1 commit interval → `Trigger.ProcessingTime` (default 300 000 ms,
  *    `IcebergSinkConfig.java:88-89`)
  *  - K2/K5 broadcast + barrier → micro-batch job boundary
  *  - S2/S4/K4 offset bookkeeping/restore → `checkpointLocation`
  *  - K8 zombie fencing → batchId guard in the commit log
  *  - K6 partial commits → intentionally absent (Spark never commits a
  *    partial batch); documented semantic difference
  */
object IngestStream {


  def start(
      source: DataFrame,
      config: EngineConfig,
      checkpointLocation: String,
      transforms: Seq[DataFrame => DataFrame] = Nil,
      triggerMs: Option[Long] = None,
      /** K11 — "topic-partition" keys assigned to this pipeline; when
        * given, a batch missing data from any of them nulls the VTTS
        * (the reference's silent-partition rule — see
        * [[graft.sink.Ingest.run]]). */
      assignedPartitions: Set[String] = Set.empty,
      /** Fold the pipeline's own maintenance into the stream: after every
        * trigger, [[graft.table.Maintenance.auto]] runs on each table the
        * batch wrote with this delta-commit threshold — a metadata-only
        * peek below it, a compaction at it (the SCALE.md-measured ~16
        * delta-commit read/rewrite break-even). Scheduling is
        * UNCONDITIONAL by Maintenance's contract, so calling it per
        * trigger is safe; compaction commits ride the same commit log the
        * writer uses, so the stream's exactly-once story is untouched (a
        * replayed batch is fenced by batchId regardless of intervening
        * compactions). None = no in-stream maintenance (the reference's
        * external-table-service model). */
      maintenanceDeltaCommits: Option[Int] = None
  ): StreamingQuery = {
    val interval = triggerMs.getOrElse(config.commitIntervalMs)
    source.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val results = Ingest.run(batch.sparkSession, batch, batchId, config, transforms,
          assignedPartitions = assignedPartitions)
        maintenanceDeltaCommits.foreach { threshold =>
          results.foreach { r =>
            val path = Ingest.tablePath(config, r.table)
            if (graft.table.IceTable.exists(path)) {
              val t = graft.table.IceTable.load(path, config.tableConfig(r.table).commitBranch)
              // In-stream compaction is an OPTIMIZATION riding a batch
              // whose data commit already succeeded — a failure here
              // (conflict with an external compactor, transient IO)
              // must not fail the trigger, or a persistently failing
              // compaction wedges INGEST in a restart loop. Same rule
              // as CommitLog's post-claim checkpoint guard. Loud WARN:
              // a compaction that never succeeds means unbounded
              // small-file growth, which the operator must see.
              graft.fs.SweepAlarm.guarded(s"in-stream maintenance on '$path'",
                s"batch $batchId's commit stands; ingest continues and " +
                  "compaction retries next trigger") {
                graft.table.Maintenance.auto(batch.sparkSession, t, threshold)
                ()
              }
            }
          }
        }
        ()
      }
      .start()
  }

  /** K12 — commit-lifecycle reporting, the analogue of the reference's
    * `CommitToTable`/`CommitComplete` events for downstream consumers
    * (`channel/Coordinator.java:259-268`).
    */
  final class CommitListener(onProgress: String => Unit)
      extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      onProgress(s"""{"event":"started","id":"${e.id}"}""")
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      onProgress(
        s"""{"event":"commit-complete","id":"${e.progress.id}",""" +
          s""""batchId":${e.progress.batchId},""" +
          s""""rows":${e.progress.numInputRows},"ts":"${e.progress.timestamp}"}"""
      )
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      onProgress(s"""{"event":"terminated","id":"${e.id}"}""")
  }
}
