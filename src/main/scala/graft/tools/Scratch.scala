package graft.tools

/** Dev scratchpad — `sbt "runMain graft.tools.Scratch <query names>"`.
  * Warms each query at sf0.001, then times 3 runs at sf0.1.
  */
object Scratch {
  private def tmpDir(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    if (args.headOption.contains("lsh-profile")) {
      import org.apache.spark.sql.functions._
      val d = spark.read.parquet(s"$sf/documents.parquet")
      val corpus = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val batch = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      // warm
      val wdir = tmpDir("lshprof-warm")
      graft.llm.LshIndex.build(corpus.limit(200), "doc_id", "text", wdir)
      graft.llm.LshIndex.queryBatch(spark, wdir, batch.limit(50), "doc_id", "text", 0.5).count()
      (1 to 3).foreach { i =>
        val dir = tmpDir(s"lshprof$i")
        val t0 = System.nanoTime()
        graft.llm.LshIndex.build(corpus, "doc_id", "text", dir)
        val t1 = System.nanoTime()
        graft.llm.LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", 0.5).count()
        val t2 = System.nanoTime()
        println(f"build ${(t1 - t0) / 1e9}%.2f s  query ${(t2 - t1) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("kmiter")) {
      // how many Lloyd iterations does spherical k-means (k=8) need to
      // reach the fixed point at each scale? (the cluster_kmeans query
      // asserts converged=true; its maxIters must cover plausible sf)
      for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/.work/sf1")) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val res = graft.llm.Similarity.kmeans(emb, "vec_id", "embedding",
          k = 8, maxIters = 2000)
        println(s"[kmiter] $dir n=${emb.count()} iters=${res.iterations} converged=${res.converged}")
      }
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("knn_ivf")
    names.foreach(n => graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}


