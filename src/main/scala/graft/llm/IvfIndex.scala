package graft.llm

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the cluster-grade form of [[Similarity.ivfKnn]]'s
  * in-session index (whose `localCheckpoint` materialization is
  * executor-local and not fault-tolerant; see DESIGN.md §2).
  *
  * Layout under `dir`:
  * {{{
  *   centroids.parquet/        (c_id, c_vec)            — nCells rows
  *   assignments.parquet/      (n_id, n_vec) PARTITIONED BY c_id
  *   CURRENT                   (optional) pointer to vN/ after a rebalance
  *   vN/centroids.parquet, vN/assignments.parquet — rebalanced geometry
  * }}}
  * A [[rebalance]] never mutates a live layout in place: it stages the
  * re-sharded centroids+assignments in a fresh `vN/` subdir and swaps
  * the `CURRENT` pointer with one atomic rename ([[activeDir]] resolves
  * it), so a crash mid-rebalance or a concurrent query never sees new
  * centroids routing against the old partition layout.
  *
  * The assignment table is hive-partitioned by cell id, so a query that
  * probes `nProbe` of `nCells` cells reads ONLY those cells' files —
  * Spark's partition pruning (`PartitionFilters: c_id IN (...)`) skips
  * the rest at planning time, the same I/O story a FAISS IVF list layout
  * gives a single node. Build once per corpus version, query many times;
  * at 100 TB the build is one training pass (driver-held centroids, one
  * shuffle per Lloyd iteration) plus one partitioned write.
  */
object IvfIndex {

  /** Train the coarse quantizer on `corpus` and persist centroids +
    * cell-partitioned normalized assignments under `dir`.
    * Returns the number of cells actually written (≤ `nCells`; empty
    * corpora produce an empty index).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nCells: Int = 16,
      kmeansIters: Int = 2
  ): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    IntegralId.require(corpus, idCol, "IvfIndex.build")
    val c = corpus
      .select(col(idCol).cast("long").as("n_id"), Similarity.normalize(col(vecCol)).as("n_vec"))
      // same degenerate-vector exclusion as [[append]] and kmeans: a NaN
      // vector left in poisons its cell's Lloyd mean every iteration
      .filter(Similarity.clusterable(col("n_vec")))
      .localCheckpoint() // training scans it repeatedly; the WRITE below is its durable form
    val dim = Similarity.detectDim(c)
    val cents = Similarity.trainCentroids(c, nCells, kmeansIters, dim)
    Files.createDirectories(Paths.get(dir))
    cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("c_id", "c_vec")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    if (cents.nonEmpty) {
      c.withColumn("c_id", Similarity.nearestCentroid(col("n_vec"), cents).getField("c_id"))
        .select("n_id", "n_vec", "c_id")
        // cluster rows by cell so each cell's files hold only that cell
        .repartition(col("c_id"))
        .write.mode("overwrite").partitionBy("c_id").parquet(s"$dir/assignments.parquet")
    }
    // a full rebuild owns the base layout: retire any rebalance pointer
    // (readers switch to the fresh base the instant the pointer is gone)
    // and its superseded version dirs
    Files.deleteIfExists(Paths.get(dir, "CURRENT"))
    pruneVersions(dir, keep = Set.empty)
    cents.length
  }

  /** Incremental append — assign new vectors to the EXISTING centroids
    * and append them to their cells' partitions, the standard IVF add
    * path (FAISS adds to trained lists the same way): no retrain, one
    * map-side assignment pass, one partitioned append; queries see the
    * new vectors immediately through the same partition-pruned scan.
    *
    * The coarse quantizer is deliberately left untouched: centroids are
    * the ROUTING structure, and moving them would strand previously
    * assigned vectors in cells a query no longer probes for them. The
    * cost is centroid drift — as appended data shifts the distribution,
    * cell occupancy skews and recall-per-nProbe decays — and the remedy
    * is a periodic [[build]] rebuild (retrain + reassign), exactly the
    * re-cluster trigger FAISS documents for drifting corpora. Ids must
    * be new; degenerate vectors (null/empty/zero/NaN) are skipped like
    * everywhere else in the vector family. Returns the number of
    * vectors appended.
    */
  def append(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): Long = {
    import spark.implicits._
    // resolve the active geometry ONCE so the centroids routing this
    // batch and the assignment table it lands in are the same version
    val adir = activeDir(dir)
    val cents = spark.read.parquet(s"$adir/centroids.parquet")
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
      .sortBy(_._1)
    require(cents.nonEmpty,
      s"IvfIndex at $dir has no centroids — build the index before appending")
    IntegralId.require(batch, idCol, "IvfIndex.append")
    val vv = batch
      .select(col(idCol).cast("long").as("n_id"), Similarity.normalize(col(vecCol)).as("n_vec"))
      .filter(Similarity.clusterable(col("n_vec")))
      .localCheckpoint() // feeds the partitioned write AND the count
    vv.withColumn("c_id", Similarity.nearestCentroid(col("n_vec"), cents).getField("c_id"))
      .select("n_id", "n_vec", "c_id")
      .repartition(col("c_id"))
      .write.mode("append").partitionBy("c_id").parquet(s"$adir/assignments.parquet")
    vv.count()
  }

  /** Re-shard the index when cells outgrow a target occupancy — the
    * executable form of the "grow nCells with the corpus" deployment
    * knob (SCALE.md): at FIXED cell geometry a probe's cost is
    * asymptotically linear in corpus size (each probed cell holds
    * n/nCells vectors); rebalancing to
    * `nCells' = ceil(vectors / targetCellRows)` restores ~constant
    * per-cell row counts, so probe cost tracks `nProbe · targetCellRows`
    * instead of the corpus.
    *
    * Retrains the coarse quantizer ON the existing (already normalized)
    * assignments, reassigns every vector, and rewrites centroids +
    * cell partitions — one training pass plus one partitioned rewrite,
    * the same cost shape as [[build]]. No-op (returns the current cell
    * count) while mean occupancy is within target. Returns the cell
    * count actually written.
    */
  def rebalance(
      spark: SparkSession,
      dir: String,
      targetCellRows: Long,
      kmeansIters: Int = 2
  ): Int = {
    import spark.implicits._
    require(targetCellRows > 0, s"targetCellRows must be > 0: $targetCellRows")
    val cur = activeDir(dir)
    val curCells = spark.read.parquet(s"$cur/centroids.parquet").count()
    val assigned = spark.read.parquet(s"$cur/assignments.parquet")
      .select("n_id", "n_vec")
      // the multi-pass retrain scans this repeatedly; the checkpoint also
      // decouples it from the source files (pruned after the swap)
      .localCheckpoint()
    val total = assigned.count()
    if (total == 0L || curCells <= 0L) return curCells.toInt
    if (total / curCells <= targetCellRows) return curCells.toInt
    // clamp in Long space BEFORE narrowing: .toInt on the Long ceil would
    // wrap past 2^31 and reach trainCentroids with a garbage (possibly
    // negative) cell count instead of the clamp
    val newCells =
      math.min((total + targetCellRows - 1) / targetCellRows, Int.MaxValue.toLong).toInt
    val dim = Similarity.detectDim(assigned)
    val cents = Similarity.trainCentroids(assigned, newCells, kmeansIters, dim)
    // Publish atomically: stage BOTH tables in a fresh versioned subdir,
    // then swap the CURRENT pointer with an atomic rename — a reader
    // resolves the pointer once and sees one consistent geometry; a crash
    // mid-rebalance leaves an orphan version dir and an intact index,
    // never new centroids routing against the old partition layout.
    val next = s"v${nextVersion(dir)}"
    val stage = s"$dir/$next"
    cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("c_id", "c_vec")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$stage/centroids.parquet")
    assigned
      .withColumn("c_id", Similarity.nearestCentroid(col("n_vec"), cents).getField("c_id"))
      .select("n_id", "n_vec", "c_id")
      .repartition(col("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(s"$stage/assignments.parquet")
    swapPointer(dir, next)
    // prune superseded version dirs, keeping the one we just replaced for
    // in-flight readers that resolved the pointer before the swap (the
    // base layout is never deleted — build() owns it)
    pruneVersions(dir, keep = Set(next, java.nio.file.Paths.get(cur).getFileName.toString))
    cents.length
  }

  /** Resolve the ACTIVE layout under `dir`: [[rebalance]] publishes its
    * rewritten centroids+assignments in a versioned subdirectory and
    * swaps a `CURRENT` pointer file atomically; readers resolve the
    * pointer ONCE per operation so centroids and assignments always come
    * from the same geometry. No pointer (a freshly [[build]]-t index) →
    * `dir` itself.
    */
  def activeDir(dir: String): String = {
    val cur = Paths.get(dir, "CURRENT")
    if (Files.exists(cur))
      s"$dir/${new String(Files.readAllBytes(cur), java.nio.charset.StandardCharsets.UTF_8).trim}"
    else dir
  }

  private def nextVersion(dir: String): Long = {
    val d = Paths.get(dir)
    val existing =
      if (!Files.isDirectory(d)) Nil
      else {
        val s = Files.list(d)
        try s.iterator().asScala.toList.map(_.getFileName.toString)
        finally s.close()
      }
    existing.collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .foldLeft(0L)(math.max) + 1
  }

  private def swapPointer(dir: String, version: String): Unit = {
    val tmp = Paths.get(dir, s"CURRENT.tmp-$version")
    Files.write(tmp, version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def pruneVersions(dir: String, keep: Set[String]): Unit = {
    val d = Paths.get(dir)
    val victims = {
      val s = Files.list(d)
      try s.iterator().asScala.toList.filter { p =>
        val n = p.getFileName.toString
        n.matches("v\\d+") && !keep.contains(n)
      }
      finally s.close()
    }
    victims.foreach { p =>
      val w = Files.walk(p)
      try w.iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }

  /** Top-k cosine ANN against a persisted index. Probed-cell routing
    * happens on the (tiny, collected) centroid table; the assignment scan
    * carries a `c_id IN (probed cells)` partition filter, so only the
    * probed cells' files are ever opened.
    */
  def query(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    import spark.implicits._
    // one pointer resolution per query: centroids and the pruned
    // assignment scan always come from the same geometry version
    val adir = activeDir(dir)
    val cents = spark.read.parquet(s"$adir/centroids.parquet")
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
      .sortBy(_._1)
    if (cents.isEmpty)
      return Seq.empty[(Long, Int, Long, Double)].toDF("q_id", "rank", "n_id", "cosine")
    val probes = Similarity.probeCells(queries, idCol, vecCol, cents, nProbe)
      .localCheckpoint() // evaluated twice: cell-set collect + the scan join
    // the probed-cell union is query-count × nProbe small — collect it so
    // the assignment scan prunes partitions with a LITERAL IN filter
    val cellSet = probes.select("c_id").distinct().as[Long].collect().toSeq
    val assigned = spark.read.parquet(s"$adir/assignments.parquet")
      .filter(col("c_id").isin(cellSet: _*))
    Similarity.scanProbed(assigned, probes, k)
  }
}
