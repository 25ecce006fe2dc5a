package graft.llm

import java.nio.file.{Files, Paths}

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
  * }}}
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
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
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
      .write.mode("append").partitionBy("c_id").parquet(s"$dir/assignments.parquet")
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
    val curCells = spark.read.parquet(s"$dir/centroids.parquet").count()
    val assigned = spark.read.parquet(s"$dir/assignments.parquet")
      .select("n_id", "n_vec")
      // lineage break: the rewrite below OVERWRITES the path this scan
      // reads — Spark (correctly) refuses a self-overwrite on a live
      // lineage; the checkpoint also feeds the multi-pass retrain
      .localCheckpoint()
    val total = assigned.count()
    if (total == 0L || curCells <= 0L) return curCells.toInt
    if (total / curCells <= targetCellRows) return curCells.toInt
    val newCells = math.min(((total + targetCellRows - 1) / targetCellRows).toInt, Int.MaxValue)
    val dim = Similarity.detectDim(assigned)
    val cents = Similarity.trainCentroids(assigned, newCells, kmeansIters, dim)
    cents.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("c_id", "c_vec")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    assigned
      .withColumn("c_id", Similarity.nearestCentroid(col("n_vec"), cents).getField("c_id"))
      .select("n_id", "n_vec", "c_id")
      .repartition(col("c_id"))
      .write.mode("overwrite").partitionBy("c_id").parquet(s"$dir/assignments.parquet")
    cents.length
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
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
      .sortBy(_._1)
    if (cents.isEmpty)
      return Seq.empty[(Long, Int, Long, Double)].toDF("q_id", "rank", "n_id", "cosine")
    val probes = Similarity.probeCells(queries, idCol, vecCol, cents, nProbe)
      .localCheckpoint() // evaluated twice: cell-set collect + the scan join
    // the probed-cell union is query-count × nProbe small — collect it so
    // the assignment scan prunes partitions with a LITERAL IN filter
    val cellSet = probes.select("c_id").distinct().as[Long].collect().toSeq
    val assigned = spark.read.parquet(s"$dir/assignments.parquet")
      .filter(col("c_id").isin(cellSet: _*))
    Similarity.scanProbed(assigned, probes, k)
  }
}
