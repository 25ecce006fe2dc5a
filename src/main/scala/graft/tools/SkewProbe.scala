package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial SKEW fixture (r17 verdict lead item): every scale number
  * before this round — sf0.1, the sf1 shards — is uniform-ish synthetic
  * data, but 100-TB corpora are zipf-skewed, and skew is what kills
  * Spark plans that look perfectly linear on uniform shapes (a hot
  * `Window.partitionBy` key lands one task with 25% of the batch; a
  * giant near-dup group makes LSH bucket joins quadratic in the GROUP
  * even when they are linear in the corpus).
  *
  * Generates TWO fixture arms of IDENTICAL row counts and schemas under
  * `outRoot/uniform` and `outRoot/skewed`, so the per-query
  * skewed/uniform time ratio isolates data SHAPE, not volume:
  *
  *  - `events` (100k rows, both arms from the driver's sf0.1): the skew
  *    arm remaps `event_type` so one route value carries ~40%+ of rows
  *    (zipf head — stresses R3 dynamic fan-out and the per-table
  *    commit), remaps `user_id` so ONE key carries 25% of every batch
  *    (the `CdcOps.resolveBatch` window's classic skew-killer), and
  *    pins 50% of `ts` onto one DAY (a hot `day(ts_t)` partition
  *    holding half of a partitioned write).
  *  - `documents` (20k rows = 4 alphabet-rotated shards of the 5k base,
  *    Sf1Probe's construction): the skew arm replaces HALF the docs
  *    (≥10k) with one near-identical duplicate group (pairwise shingle
  *    Jaccard ≈0.97 — one LSH near-clique, the star-contraction and
  *    bucket-join worst case), appends one fixed hot shingle to 50% of
  *    ALL docs (the inverted-index DF cap's worst case), and inflates
  *    ~0.25% of docs to 100× length (long-tail length skew).
  *  - `embeddings` (8k rows = 4 signed-permutation shards of the 2k
  *    base): the skew arm makes 10% of vectors IDENTICAL (one exact-dup
  *    cluster: a single degenerate LSH bucket and a quadratic pair
  *    group), 5% all-zero and a handful NaN (degenerate vectors that
  *    must be filtered, not crash).
  *  - relational tables: copied as-is into both arms (control group —
  *    their ratios should sit at 1.0).
  *
  * All selections are deterministic (`xxhash64` of the row key — no
  * Random, no Date.now), so both arms are byte-reproducible.
  * `scripts/skew_sweep.sh` runs the full Bench surface interleaved
  * (uniform, skewed) × 2 and `scripts/skew_report.py` writes the
  * per-query ratio table for SCALE.md, flagging anything >3×.
  */
object SkewProbe {

  private val Shards = 4

  /** One fixed ~60-word base for the giant near-dup group, drawn from
    * the corpus vocabulary so tokenization/shingling behave like real
    * rows. Each member appends one unique token → pairwise Jaccard stays
    * ≈ w/(w+2) ≈ 0.97: near-identical, never exact.
    */
  private val GroupBase: String = Seq(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "join", "plan", "stage", "shuffle",
    "read", "write", "merge", "split", "count", "sum", "min", "max",
    "table", "row", "page", "block", "index", "probe", "build", "cache",
    "disk", "net", "cpu", "mem", "task", "core", "node", "rack",
    "broadcast", "exchange", "codegen", "prune", "push", "skip", "stat",
    "meta", "file", "byte", "word", "text").mkString(" ")

  /** The hot shingle: one fixed 6-token phrase appended to 50% of docs —
    * with 3-gram shingles it contributes ~6 shared shingles whose
    * document frequency is half the corpus.
    */
  private val HotPhrase = "shared boilerplate footer notice appears here"

  /** Deterministic percent bucket of a key column: pmod(xxhash64(k, salt), 100). */
  private def pct(k: Column, salt: Int): Column =
    pmod(xxhash64(k, lit(salt)), lit(100))

  private def write(spark: SparkSession, df: DataFrame, dst: String, t: String): Unit = {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val tmp = s"$dst/_tmp_$t"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = {
      val s = JFiles.list(Paths.get(tmp))
      try s.iterator().asScala.toList
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      finally s.close()
    }
    JFiles.createDirectories(Paths.get(dst))
    JFiles.move(part, Paths.get(s"$dst/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val w = JFiles.walk(Paths.get(tmp))
    try w.iterator().asScala.toList.reverse.foreach(JFiles.deleteIfExists(_))
    finally w.close()
  }

  /** The matched-volume UNIFORM base frames (before any skewing). */
  private def baseDocs(spark: SparkSession, src: String): DataFrame = {
    val d = spark.read.parquet(s"$src/documents.parquet")
    val docOff = d.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until Shards).map { i =>
      d.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text", ScaleProbe.rotAlpha(i, col("text")))
    }.reduce(_.unionByName(_))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def baseEmbeddings(spark: SparkSession, src: String): DataFrame = {
    val e = spark.read.parquet(s"$src/embeddings.parquet")
    val vecOff = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val dim = e.select(size(col("embedding")).as("__d"))
      .filter(col("__d") > 0).head().getInt(0)
    (0 until Shards).map { i =>
      e.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
        .withColumn("embedding", shardVec(i, col("embedding"), dim))
    }.reduce(_.unionByName(_))
  }

  /** Sf1Probe's per-shard orthogonal map (roll + deterministic sign
    * flip) — preserves within-shard near-dup structure, decorrelates
    * across shards. Duplicated signature kept private to the fixture.
    */
  private def shardVec(i: Int, c: Column, dim: Int): Column = {
    if (i == 0) return c
    val rolled = concat(slice(c, lit(i + 1), size(c) - i), slice(c, lit(1), lit(i)))
    val rnd = new scala.util.Random(1000 + i)
    val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    zip_with(rolled, lit(signs), (a, b) => a * b)
  }

  private def skewEvents(ev: DataFrame): DataFrame = ev
    // zipf head on the route field: ~40% of rows remapped onto one value
    // (plus its organic share) — one route table gets the hot half
    .withColumn("event_type",
      when(pct(col("event_id"), 1) < 40, lit("purchase")).otherwise(col("event_type")))
    // one CDC key with 25% of every batch: resolveBatch's
    // Window.partitionBy(user_id) gets a single hot partition
    .withColumn("user_id",
      when(pct(col("event_id"), 2) < 25, lit(1L)).otherwise(col("user_id")))
    // hot partition key: half of all rows land on ONE day (time-of-day
    // varies so the rows stay distinct and sortable)
    .withColumn("ts",
      when(pct(col("event_id"), 3) < 50,
        to_timestamp(lit("2024-01-03 00:00:00")) +
          expr("make_interval(0, 0, 0, 0, 0, 0, pmod(event_id, 86400))"))
        .otherwise(col("ts")))

  private def skewDocs(docs: DataFrame): DataFrame = docs
    // the giant near-dup group: HALF the corpus (≥10k members) becomes
    // one near-identical cluster — every pair Jaccard ≈0.97
    .withColumn("text",
      when(pct(col("doc_id"), 4) < 50,
        concat(lit(GroupBase), lit(" m"), col("doc_id").cast("string")))
        .otherwise(col("text")))
    // hot shingle in 50% of ALL docs (group members included when the
    // buckets land that way — realistic boilerplate)
    .withColumn("text",
      when(pct(col("doc_id"), 5) < 50,
        concat(col("text"), lit(" "), lit(HotPhrase))).otherwise(col("text")))
    // long tail: ~0.25% of docs at 100× length
    .withColumn("text",
      when(pct(col("doc_id"), 6) === 0 && pct(col("doc_id"), 7) < 25,
        concat_ws(" ", array_repeat(col("text"), 100))).otherwise(col("text")))
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def skewEmbeddings(em: DataFrame, dim: Int): DataFrame = {
    val hot = Array.fill(dim)((1.0 / math.sqrt(dim)).toFloat)
    val zero = Array.fill(dim)(0.0f)
    val withNaN = Array.tabulate(dim)(d => if (d == 0) Float.NaN else 0.1f)
    em.withColumn("embedding",
      when(pct(col("vec_id"), 8) < 10, lit(hot))                       // 10% identical
        .when(pct(col("vec_id"), 8) < 15, lit(zero))                   // 5% zero
        .when(pct(col("vec_id"), 8) === 15 && pct(col("vec_id"), 9) < 10,
          lit(withNaN))                                                // ~0.1% NaN
        .otherwise(col("embedding")))
  }

  def generate(spark: SparkSession, src: String, outRoot: String): Unit = {
    val uniformDir = s"$outRoot/uniform"
    val skewDir = s"$outRoot/skewed"
    // control group: relational tables identical in both arms
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      write(spark, df, uniformDir, t)
      write(spark, df, skewDir, t)
    }
    val ev = spark.read.parquet(s"$src/events.parquet")
    write(spark, ev, uniformDir, "events")
    write(spark, skewEvents(ev), skewDir, "events")
    val docs = baseDocs(spark, src).localCheckpoint()
    write(spark, docs, uniformDir, "documents")
    write(spark, skewDocs(docs), skewDir, "documents")
    val em = baseEmbeddings(spark, src).localCheckpoint()
    val dim = em.select(size(col("embedding")).as("__d"))
      .filter(col("__d") > 0).head().getInt(0)
    write(spark, em, uniformDir, "embeddings")
    write(spark, skewEmbeddings(em, dim), skewDir, "embeddings")
    java.nio.file.Files.write(java.nio.file.Paths.get(outRoot, "_DONE"), Array.empty[Byte])
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "/root/repo/.work/skew"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(outRoot, "_DONE"))) {
      println(s"generating skew fixture under $outRoot …")
      generate(spark, src, outRoot)
      println("done")
    } else println(s"$outRoot already generated (_DONE present)")
    spark.stop()
  }
}
