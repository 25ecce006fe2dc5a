package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted hyperplane-LSH embedding index — the vector twin of
  * [[LshIndex]]: build the signature buckets over the existing corpus
  * ONCE, then dedup each arriving embedding batch against it with no
  * corpus rescan or self-join. Candidates come from signature-bucket
  * collisions; every reported pair is verified with the EXACT cosine, so
  * false positives never survive and the oracle is the exact cross-set
  * pair list (recall follows the same auto-sized bits/tables trade-off
  * as [[Dedup.embeddingNearDupPairs]]'s in-session path).
  *
  * Layout under `dir` (all through Spark's filesystem layer):
  * {{{
  *   meta.parquet/       bits / tables / dim (signature compatibility)
  *   vectors.parquet/    (id, v)            — normalized verify vectors
  *   buckets.parquet/    (id, t, sig)       — per-table LSH signatures
  * }}}
  *
  * Query cost at scale: the batch's (table, signature) keys broadcast
  * into a join against the bucket index — the corpus side never
  * shuffles; only candidate corpus vectors are fetched for the verify.
  */
object EmbIndex {

  private def writeMeta(spark: SparkSession, dir: String, bits: Int, tables: Int, dim: Int)
      : Unit = {
    import spark.implicits._
    Seq((bits, tables, dim)).toDF("bits", "tables", "dim")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  private def readMeta(spark: SparkSession, dir: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$dir/meta.parquet").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  /** The signature derivation IS [[Dedup.hyperplaneSigRows]] — one shared
    * definition, so the stored index and the in-session candidate stream
    * can never drift apart.
    */
  private def sigRows(
      vecs: DataFrame, idName: String, vecName: String,
      bits: Int, tables: Int, dim: Int): DataFrame =
    Dedup.hyperplaneSigRows(vecs, idName, vecName, bits, tables, dim)

  /** Normalized, dedup-able vectors of a frame: degenerate embeddings
    * (null/empty/zero/NaN/Inf) can never verify as near-dups — their
    * cosine is NULL/NaN — but their signatures would still collide
    * everywhere, so they are excluded up front (the analogue of
    * [[LshIndex]] skipping empty shingle sets).
    */
  private def usable(df: DataFrame, idCol: String, vecCol: String, outId: String): DataFrame =
    df.select(col(idCol).cast("long").as(outId),
        Similarity.normalize(col(vecCol)).as("v"))
      .filter(Similarity.clusterable(col("v")))

  /** Index `corpus` under `dir`. `bits`/`tables` default to the same
    * auto-sizing as the in-session path: bits from the corpus count
    * capped at the recall-feasible bound for `threshold`, tables from
    * the threshold at those bits — so the per-pair miss guarantee holds
    * as the corpus grows. Returns the number of vectors indexed.
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      threshold: Double,
      bits: Int = Dedup.AutoSize,
      tables: Int = Dedup.AutoSize
  ): Long = {
    val spark = corpus.sparkSession
    val vv = usable(corpus, idCol, vecCol, "id")
    vv.write.mode("overwrite").parquet(s"$dir/vectors.parquet")
    val stored = spark.read.parquet(s"$dir/vectors.parquet")
    val n = stored.count() // one job: sizes the bits AND is the return value
    val dim = Similarity.detectDim(stored.select(col("v").as("n_vec")))
    val bitsVolume = if (bits > 0) bits else Dedup.sizedLshBits(n)
    val useBits =
      if (bits > 0 || tables > 0) bitsVolume
      else math.min(bitsVolume, Dedup.recallFeasibleBits(threshold))
    val useTables = if (tables > 0) tables else Dedup.sizedLshTables(threshold, useBits)
    writeMeta(spark, dir, useBits, useTables, dim)
    sigRows(stored, "id", "v", useBits, useTables, dim)
      .write.mode("overwrite").parquet(s"$dir/buckets.parquet")
    n
  }

  /** Near-duplicate pairs between `batch` and the indexed corpus:
    * (id_new, id_indexed, cosine) for exact cosine ≥ `threshold`,
    * candidates restricted to signature collisions in any table.
    * Within-batch duplicates are NOT reported — run the in-session pair
    * search on the batch, or fold it in with [[append]].
    */
  def queryBatch(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val (bits, tables, dim) = readMeta(spark, dir)
    val newVecs = usable(batch, idCol, vecCol, "id_new")
      .withColumnRenamed("v", "v_new")
      .localCheckpoint() // feeds the signature probe AND the verify join
    val newSigs = sigRows(newVecs, "id_new", "v_new", bits, tables, dim)
    val index = spark.read.parquet(s"$dir/buckets.parquet")
    // batch side broadcast: the corpus-sized index never shuffles
    val candidates = index
      .join(broadcast(newSigs), Seq("t", "sig"))
      .select(col("id_new"), col("id").as("id_indexed"))
      .distinct()
    val storedVecs = spark.read.parquet(s"$dir/vectors.parquet")
      .select(col("id").as("id_indexed"), col("v").as("v_idx"))
    // the verify side stays batch-×-candidates sized — broadcast it so
    // the corpus-sized vector table never shuffles either (the doc's
    // cost contract; an unhinted join would sort-merge the whole table)
    broadcast(candidates.join(broadcast(newVecs), "id_new"))
      .join(storedVecs, "id_indexed")
      .select(col("id_new"), col("id_indexed"),
        Similarity.dot(col("v_new"), col("v_idx")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Fold a batch into the index. Same failure semantics as
    * [[LshIndex.append]]: buckets first, vectors second — a crash
    * between the two only loses recall until re-append (candidates with
    * no verify vector drop out), and a retry's duplicate bucket rows are
    * absorbed by the candidate `distinct()`. Ids must be new. Returns
    * the number of vectors appended.
    */
  def append(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): Long = {
    val (bits, tables, dim) = readMeta(spark, dir)
    val vv = usable(batch, idCol, vecCol, "id").localCheckpoint()
    sigRows(vv, "id", "v", bits, tables, dim)
      .write.mode("append").parquet(s"$dir/buckets.parquet")
    vv.write.mode("append").parquet(s"$dir/vectors.parquet")
    vv.count()
  }
}
