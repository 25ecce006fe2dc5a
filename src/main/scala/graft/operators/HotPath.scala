package graft.operators

import org.apache.spark.sql.DataFrame

/** Hot-path materialization policy for the engine's per-batch pipelines
  * (the CDC resolve and the streaming dedup shells), where one frame
  * feeds several downstream jobs and recomputing it per consumer would
  * multiply the batch's dominant cost.
  *
  * Default: `localCheckpoint()` — blocks on the executors that computed
  * them, lineage truncated. The recovery story that makes the truncation
  * safe HERE (and only here): every pin sits inside a Structured
  * Streaming `foreachBatch` body or a `resolveBatch` called from one, so
  * a lost executor fails the current attempt, the stream retries the
  * SAME batch from its replayable source, and the batchId fences
  * (CommitLog's replay guard, the index folds' delete-then-write) keep
  * the retry exactly-once. The cost of the truncated lineage is
  * therefore a BATCH retry instead of a block recompute — a latency
  * choice, not a correctness one.
  *
  * On a high-churn cluster (frequent executor loss: spot/preemptible
  * fleets) re-running whole batches can dominate; set
  *
  *   spark.graft.hotpath.reliableCheckpoint = true
  *
  * and the same pins become reliable `checkpoint()`s — identical plan
  * semantics (both truncate to a LogicalRDD; analysis, self-join
  * behavior, and downstream plans are byte-identical), but blocks are
  * written to `spark.sparkContext.setCheckpointDir(...)` on the cluster
  * FS and survive any executor's death. Requires the checkpoint dir to
  * be set (Spark throws a clear error if not). Replicated in-memory
  * persist was considered and rejected: `persist` keeps lineage, which
  * reintroduces the multi-execution of nondeterministic upstream stages
  * that the eager pin exists to prevent.
  */
object HotPath {

  val ReliableConf = "spark.graft.hotpath.reliableCheckpoint"

  /** Materialize a per-batch frame once for multi-consumer reuse (see
    * object doc for the recovery story and the reliable-mode knob).
    */
  def pin(df: DataFrame): DataFrame = {
    val reliable =
      df.sparkSession.conf.getOption(ReliableConf).exists(_.toBoolean)
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** `.pin()` at the end of a chain — same as [[pin]]. */
  implicit final class Pinnable(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = HotPath.pin(df)
  }

  /** Spread an UNDER-PARALLEL frame across the cluster before a
    * CPU-heavy per-row kernel (minhash signatures, tokenization, codecs).
    *
    * A corpus that arrives as a handful of scan splits — one small
    * parquet file, a coalesced upstream exchange — serializes the kernel
    * on one core while the rest of the cluster idles (guide §2.5 "input
    * skew"). A corpus that is already wider than the cluster's core
    * count gains nothing from an extra exchange, so this is a strict
    * NO-OP there: at scale the scan has thousands of splits and no bytes
    * move.
    *
    * SCAN-SHAPED inputs only: the partition probe (`df.rdd`) is
    * plan-time for narrow plans, but under AQE it EXECUTES every
    * upstream shuffle stage of a plan that has one — and the repartition
    * would then re-run them (no cross-query exchange reuse). Frames that
    * already contain an aggregate/join/repartition/window/sort carry
    * shuffle partitioning (≈ cluster-parallel) and pass through
    * untouched, which also keeps the probe job-free by construction.
    */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // KEEP IN SYNC with Spark upgrades: this allowlist names the logical
    // nodes that plan to a shuffle. A new shuffle-carrying node type
    // (or a rename) would silently fall through to the `df.rdd` probe,
    // which under AQE EXECUTES the upstream shuffle stages — plan-time
    // cost becomes job cost. The probe itself is plan-only for
    // scan-shaped frames (full physical planning, no job); on per-batch
    // trigger paths that is one planning pass per call, measured cheap
    // relative to the kernels it feeds (r18 ADVICE notes the trade).
    val hasExchangeShape = df.queryExecution.analyzed.collectFirst {
      case p @ (_: Aggregate | _: Join | _: RepartitionOperation | _: Window | _: Sort |
          _: Distinct | _: Deduplicate) => p
    }.nonEmpty
    if (hasExchangeShape) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
