package graft.llm

import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch-partition compaction for the persisted incremental indexes
  * ([[LshIndex]] / [[EmbIndex]]): folds aged `batch=<b>` partitions
  * (0 ≤ b ≤ upToBatch) into the base `batch=-1` partition, bounding the
  * partition count a long-running streaming writer accumulates — the
  * bin-pack analogue of IceTable's small-file rewrite, for the index
  * family (one partition per micro-batch forever would drown the file
  * listing long before the data itself is a problem at 100 TB).
  *
  * Correctness story:
  *  - Folded rows KEEP their `src_batch` column, so
  *    `queryBatch(excludeBatch = b)` still excludes a compacted batch's
  *    rows — a replayed streaming batch can never self-match against its
  *    own previous append even after that append was folded away.
  *  - `appendBatch(b ≤ compacted_through)` no-ops (enforced by the index
  *    objects from meta): the replayed batch's rows are already in the
  *    base partition, and the usual delete-then-write of `batch=b` would
  *    DUPLICATE them (the partition delete cannot reach folded rows).
  *  - Contract: only compact batches the stream can no longer replay —
  *    `upToBatch` strictly below the streaming checkpoint's last
  *    committed batch id (Spark replays at most the first uncommitted
  *    batch, so committed-1 and below are final).
  *
  * Crash story — a staged two-phase move per table; every window loses at
  * most RECALL (rows transiently invisible), never correctness, and every
  * state is resumable by [[recover]] (run automatically at the start of
  * the next compaction):
  *  1. aged rows are rewritten into `_compact_staging/` — an
  *     underscore-prefixed dir is invisible to Spark's partition
  *     discovery, so the transient duplicates are never readable;
  *  2. a `_compact_plan` marker listing the folded batch ids is committed
  *     via atomic rename — the point of no return;
  *  3. the aged `batch=<b>` dirs are deleted (rows durable in staging but
  *     invisible until step 4);
  *  4. staged data files MOVE into `batch=-1/` (per-file atomic rename,
  *     resumable) and the marker + staging dir are removed.
  * Crash before 2: next compaction discards the staging (sources intact —
  * nothing lost). Crash after 2: [[recover]] re-deletes the listed
  * sources and finishes the moves (both idempotent).
  */
private[llm] object IndexMaintenance {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stagingDir(table: String) = new Path(table, "_compact_staging")
  private def planFile(table: String)   = new Path(table, "_compact_plan")
  private def planTmp(table: String)    = new Path(table, "_compact_plan.tmp")

  /** Batch ids with a live `batch=<b>` partition dir in [0, upToBatch]. */
  private def agedBatches(f: FileSystem, table: String, upToBatch: Long): Seq[Long] = {
    val root = new Path(table)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(n => Try(n.stripPrefix("batch=").toLong).toOption)
      .filter(b => b >= 0 && b <= upToBatch)
      .sorted
  }

  /** Finish (marker present: delete listed sources, move staged files) or
    * discard (no marker: sources intact) a previously crashed compaction.
    * Idempotent; called at the start of every [[compactTable]].
    */
  def recover(spark: SparkSession, table: String): Unit = {
    val f = fsOf(spark, new Path(table))
    if (f.exists(planFile(table))) {
      val in = f.open(planFile(table))
      val ids =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().flatMap(l =>
          Try(l.trim.toLong).toOption).toSeq
        finally in.close()
      ids.foreach(b => f.delete(new Path(table, s"batch=$b"), true))
      moveStaged(f, table)
      f.delete(planFile(table), false)
      f.delete(stagingDir(table), true)
    } else {
      f.delete(stagingDir(table), true)
    }
    f.delete(planTmp(table), false)
    ()
  }

  /** Move every staged DATA file into the base partition (skip `_SUCCESS`
    * and other metadata). Part-file names carry a per-job UUID, so a name
    * can never collide with an existing base file; a file already moved by
    * a crashed earlier pass is simply absent from staging — the move is
    * resumable.
    */
  private def moveStaged(f: FileSystem, table: String): Unit = {
    val stage = stagingDir(table)
    if (!f.exists(stage)) return
    val base = new Path(table, "batch=-1")
    f.mkdirs(base)
    f.listStatus(stage).toSeq
      .filter(_.isFile)
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .foreach { p =>
        require(f.rename(p, new Path(base, p.getName)),
          s"compaction could not move $p into $base")
      }
  }

  /** Fold the aged batch partitions of one data table into its base
    * partition (protocol above). `schema` is the table's full read schema
    * including the `batch` partition column (explicit, so an empty
    * partition layout reads as an empty frame instead of failing
    * inference).
    */
  def compactTable(
      spark: SparkSession,
      table: String,
      schema: StructType,
      upToBatch: Long
  ): Unit = {
    recover(spark, table)
    val f = fsOf(spark, new Path(table))
    val aged = agedBatches(f, table, upToBatch)
    if (aged.isEmpty) return
    // 1. stage: rewrite the aged rows (batch partition column dropped —
    // they land in batch=-1 — src_batch kept) into the invisible dir
    spark.read.schema(schema).parquet(table)
      .filter(col("batch").isin(aged: _*))
      .drop("batch")
      .write.mode("overwrite").parquet(stagingDir(table).toString)
    // 2. commit point: the plan marker appears atomically
    val out = f.create(planTmp(table), true)
    try out.write(aged.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(planTmp(table), planFile(table)),
      s"compaction could not commit plan marker for $table")
    // 3. drop the sources (staged rows now authoritative)
    aged.foreach(b => f.delete(new Path(table, s"batch=$b"), true))
    // 4. make the folded rows visible in base, then clean up
    moveStaged(f, table)
    f.delete(planFile(table), false)
    f.delete(stagingDir(table), true)
    ()
  }
}
