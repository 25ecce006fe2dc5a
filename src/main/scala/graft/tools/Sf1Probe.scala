package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 end-to-end validation (r12 verdict stretch): the SCALE.md
  * exponents come from synthetic probes; this times the most expensive
  * REAL driver queries on their production code paths at sf0.1 vs a
  * locally generated sf1 (10× rows) and fits per-query scale exponents
  * `log10(t_sf1 / t_sf0.1)` — 1.0 = linear, 0 = flat.
  *
  * sf1 is generated once under `.work/sf1` as ten key-shifted shards of
  * the driver's sf0.1 (same value distributions, FK graph intact within
  * each shard — a join key matches only its own shard, so join
  * selectivities scale the way a real 10× corpus would). Content that
  * feeds similarity operators is varied per shard so dedup/ANN work
  * scales honestly instead of finding 10 exact copies: document text is
  * alphabet-rotated (the `ScaleProbe.scaled` trick) and embeddings get a
  * per-shard signed permutation (see [[shardVec]]). The driver's
  * `/root/testdata` stays untouched.
  */
object Sf1Probe {

  private val Shards = 10

  /** Top-10 most expensive real queries per BENCH_r12 (split entries
    * excluded) — the set the exponent fit runs on by default.
    */
  private val Default = Seq(
    "dedup_embedding_incremental", "dedup_incremental", "streaming_join",
    "search_bm25_indexed", "pipeline_dedup_curate", "dedup_semantic",
    "maintenance_binpack", "multimodal_resize", "dedup_embedding_lsh",
    "search_phrase_indexed")

  private def shardCol(i: Int, key: Column, off: Long): Column = key + lit(i * off)

  // the ONE alphabet-rotation fixture (shared with ScaleProbe.scaled)
  private def rotText(i: Int, c: Column): Column = ScaleProbe.rotAlpha(i, c)

  /** Per-shard orthogonal map: cyclic roll by `i` then a deterministic
    * ±1 sign flip per dimension (seeded by the shard). Inner products are
    * PRESERVED within a shard (signed permutation = orthogonal), so each
    * shard's near-dup structure is exactly the base corpus's, while
    * cross-shard cosines decorrelate — a bare roll left shards
    * correlated enough to inflate the true pair count ~n², which would
    * have measured the DATA, not the operator.
    */
  private def shardVec(i: Int, c: Column, dim: Int): Column = {
    if (i == 0) return c
    val rolled = concat(slice(c, lit(i + 1), size(c) - i), slice(c, lit(1), lit(i)))
    val rnd = new scala.util.Random(1000 + i)
    // sign array sized to the CORPUS width: a hardcoded 64 would
    // null-pad every wider vector through zip_with (and truncate
    // narrower ones), poisoning the non-identity shards only — looking
    // like an operator bug instead of a fixture bug
    val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    zip_with(rolled, lit(signs), (a, b) => a * b)
  }

  def generate(spark: SparkSession, src: String, dst: String): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    val custOff = off(rd("customer"), "c_custkey")
    val suppOff = off(rd("supplier"), "s_suppkey")
    val partOff = off(rd("part"), "p_partkey")
    val ordOff = off(rd("orders"), "o_orderkey")
    val evOff = off(rd("events"), "event_id")
    val userOff = off(rd("events"), "user_id")
    val docOff = off(rd("documents"), "doc_id")
    val vecOff = off(rd("embeddings"), "vec_id")
    def shards(t: String)(f: (Int, DataFrame) => DataFrame): DataFrame = {
      val base = rd(t)
      (0 until Shards).map(i => f(i, base)).reduce(_.unionByName(_))
    }
    // the driver ships each table as ONE parquet FILE (`<t>.parquet`), and
    // the streaming queries rely on that (`pathGlobFilter` matches the
    // leaf FILE name) — write a single part and rename it into place
    def write(df: DataFrame, t: String): Unit = {
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
    // dimension constants don't scale in TPC-H
    write(rd("region"), "region")
    write(rd("nation"), "nation")
    write(shards("customer")((i, d) =>
      d.withColumn("c_custkey", shardCol(i, col("c_custkey"), custOff))), "customer")
    write(shards("supplier")((i, d) =>
      d.withColumn("s_suppkey", shardCol(i, col("s_suppkey"), suppOff))), "supplier")
    write(shards("part")((i, d) =>
      d.withColumn("p_partkey", shardCol(i, col("p_partkey"), partOff))), "part")
    write(shards("orders")((i, d) => d
      .withColumn("o_orderkey", shardCol(i, col("o_orderkey"), ordOff))
      .withColumn("o_custkey", shardCol(i, col("o_custkey"), custOff))), "orders")
    write(shards("lineitem")((i, d) => d
      .withColumn("l_orderkey", shardCol(i, col("l_orderkey"), ordOff))
      .withColumn("l_partkey", shardCol(i, col("l_partkey"), partOff))
      .withColumn("l_suppkey", shardCol(i, col("l_suppkey"), suppOff))), "lineitem")
    write(shards("events")((i, d) => d
      .withColumn("event_id", shardCol(i, col("event_id"), evOff))
      .withColumn("user_id", shardCol(i, col("user_id"), userOff))), "events")
    write(shards("documents")((i, d) => d
      .withColumn("doc_id", shardCol(i, col("doc_id"), docOff))
      .withColumn("text", rotText(i, col("text")))), "documents")
    val embDim = rd("embeddings")
      .select(size(col("embedding")).as("__d")).filter(col("__d") > 0).head().getInt(0)
    write(shards("embeddings")((i, d) => d
      .withColumn("vec_id", shardCol(i, col("vec_id"), vecOff))
      .withColumn("embedding", shardVec(i, col("embedding"), embDim))), "embeddings")
    java.nio.file.Files.write(java.nio.file.Paths.get(dst, "_DONE"), Array.empty[Byte])
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = "/root/repo/.work/sf1"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "_DONE"))) {
      println("generating sf1 …")
      generate(spark, src, dst)
    }
    // `--generate-only`: scripts/sf1_verify.sh materializes the dataset
    // and runs graft.Verify itself — no timing sweep wanted
    if (args.sameElements(Array("--generate-only"))) { spark.stop(); return }
    val names = if (args.nonEmpty) args.toSeq else Default
    def dropPinned(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
    }
    def timeQ(name: String, dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        dropPinned()
        dt
      }.min
    println(f"${"query"}%-32s ${"sf0.1"}%8s ${"sf1"}%8s  exp")
    names.foreach { n =>
      // JIT/codegen warmup on the small sf
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[sf1probe] warmup $n failed: ${e.getMessage}") }
      dropPinned()
      val t01 = timeQ(n, src)
      val t1 = timeQ(n, dst)
      val exp = math.log(t1 / t01) / math.log(10.0)
      println(f"$n%-32s $t01%8.2f $t1%8.2f  $exp%5.2f")
    }
    spark.stop()
  }
}
