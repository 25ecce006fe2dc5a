package graft.table

import org.apache.spark.sql.SparkSession

/** Executable maintenance policy — the measured arithmetic in SCALE.md
  * turned into calls a pipeline can schedule unconditionally after every
  * batch (both are cheap no-ops while the table/index is healthy).
  *
  * The reference leaves compaction to an external table service; a
  * Spark-native engine can fold the decision into the pipeline itself,
  * because the signals (delta-commit count, cell occupancy) live in the
  * same metadata the writer already touches.
  */
object Maintenance {

  /** SCALE.md "CDC / MERGE read path": read cost grows ~25–30 ms per
    * accumulated delta commit past the floor, and a compaction costs
    * roughly one amplified read plus the rewrite — so read-heavy tables
    * break even at ~16 delta commits (≈6× read amplification).
    * Write-heavy tables can stretch the threshold to ~64.
    */
  val DefaultDeltaCommitThreshold = 16

  final case class TableDecision(
      deltaCommits: Int,
      threshold: Int,
      compacted: Boolean
  )

  /** Compact `table` iff its accumulated delta-commit count has reached
    * `threshold` ([[IceTable.deltaCommitsSinceCompaction]] — equality-
    * delete commits since the last full rewrite). Below threshold this
    * is a metadata-only peek (one commit-log scan, no Spark job), so
    * calling it after every ingest batch is safe; at threshold it runs
    * [[IceTable.compact]], which folds the delete chain and restores the
    * read floor. Returns what it saw and did.
    */
  def auto(
      spark: SparkSession,
      table: IceTable,
      threshold: Int = DefaultDeltaCommitThreshold,
      sortBy: Seq[String] = Nil
  ): TableDecision = {
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val deltas = table.deltaCommitsSinceCompaction
    if (deltas >= threshold) {
      table.compact(spark, sortBy = sortBy)
      TableDecision(deltas, threshold, compacted = true)
    } else TableDecision(deltas, threshold, compacted = false)
  }

  final case class IndexDecision(
      cellsBefore: Long,
      cellsAfter: Long,
      rebalanced: Boolean
  )

  /** Rebalance the IVF index at `dir` iff mean cell occupancy exceeds
    * `targetCellRows` — [[graft.llm.IvfIndex.rebalance]] embeds the
    * occupancy guard (SCALE.md "IVF cell-geometry rebalance": 10× corpus
    * growth at fixed geometry degrades probes 4.15×; re-sharding to
    * `ceil(vectors / targetCellRows)` cells restores 1.64× of base), so
    * this just runs it and reports whether the geometry changed.
    */
  def autoIndex(
      spark: SparkSession,
      dir: String,
      targetCellRows: Long,
      kmeansIters: Int = 2
  ): IndexDecision = {
    val adirBefore = graft.llm.IvfIndex.activeDir(dir)
    // unconditional-scheduling contract: before the index exists this is
    // a no-op, like auto's pre-threshold arm — not a crash. The existence
    // probe goes through HADOOP's filesystem layer, like the whole IVF
    // control plane since r14 (IvfIndex resolves activeDir through
    // ControlFs): an index on the cluster default FS (hdfs://, s3a://)
    // resolves to nothing on the driver's LOCAL disk, and a java.nio
    // gate would no-op autoIndex forever on exactly the deployments it
    // targets.
    if (!graft.fs.ControlFs.exists(s"$adirBefore/centroids.parquet"))
      return IndexDecision(0L, 0L, rebalanced = false)
    val before = spark.read.parquet(s"$adirBefore/centroids.parquet").count()
    val after = graft.llm.IvfIndex.rebalance(spark, dir, targetCellRows, kmeansIters)
    // geometry-version change, not cell-count equality, is the acted signal
    IndexDecision(before, after.toLong,
      rebalanced = graft.llm.IvfIndex.activeDir(dir) != adirBefore)
  }
}
