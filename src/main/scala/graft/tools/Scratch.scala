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
    // override with SPARK_GRAFT_SF_DIR to time against another fixture
    // (e.g. the r17 skew arms under .work/skew/)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    if (args.headOption.contains("fsops")) {
      // Where do a commit's ~8 ms go post-FS-port? Time each control-
      // plane primitive on a 202-file dir, ControlFs vs raw java.nio.
      import graft.fs.ControlFs
      val dir = tmpDir("fsops")
      val payload = ("x" * 400).getBytes
      (1 to 200).foreach(i => ControlFs.createExclusive(s"$dir/v$i.json", payload))
      def time(label: String, n: Int)(f: Int => Unit): Unit = {
        (1 to 50).foreach(f) // warm
        val t0 = System.nanoTime()
        (1 to n).foreach(f)
        println(f"$label%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms/op")
      }
      time("ControlFs.list(202)", 500)(_ => ControlFs.list(dir))
      time("ControlFs.listNames(202)", 500)(_ => ControlFs.listNames(dir))
      time("nio DirectoryStream(202)", 500) { _ =>
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try s.count() finally s.close()
      }
      time("ControlFs.readSmall(400B)", 1000)(i => ControlFs.readSmallBytes(s"$dir/v${i % 200 + 1}.json"))
      time("nio readAllBytes(400B)", 1000)(i =>
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/v${i % 200 + 1}.json")))
      var cx = 0
      time("ControlFs.createExclusive", 500) { _ =>
        cx += 1; ControlFs.createExclusive(s"$dir/cx$cx", payload)
      }
      var nx = 0
      time("nio CREATE_NEW write", 500) { _ =>
        nx += 1
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/nx$nx"), payload,
          java.nio.file.StandardOpenOption.CREATE_NEW, java.nio.file.StandardOpenOption.WRITE)
        ()
      }
      time("ControlFs.status", 1000)(i => ControlFs.status(s"$dir/v${i % 200 + 1}.json"))
      time("ControlFs.fsFor alone", 2000)(_ => ControlFs.fsFor(s"$dir/v1.json"))
      val (cachedFs, cachedRoot) = ControlFs.fsFor(dir)
      time("pre-resolved fs.listStatus(202)", 500)(_ => cachedFs.listStatus(cachedRoot))
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
    if (args.headOption.exists(_.startsWith("prof:"))) {
      // Per-query control-plane attribution: run each named query 3x at
      // sf0.1 (after an sf0.001 warmup) and print the ControlFs op-profile
      // delta of the LAST run next to its wall time — which primitive,
      // how many calls, how many ms. `sparkWriteJob`/`footerStatsPass`
      // rows split the write path into data-plane vs footer-read cost.
      import graft.fs.ControlFs
      val names = args.head.stripPrefix("prof:").split(',').toSeq
      names.foreach(n => graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
      names.foreach { n =>
        var last: Map[String, (Long, Long)] = Map.empty
        val times = (1 to 3).map { _ =>
          ControlFs.resetProfile()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sf).count()
          val dt = (System.nanoTime() - t0) / 1e9
          last = ControlFs.profileSnapshot()
          dt
        }
        println(f"== $n: ${times.map(t => f"$t%.2f").mkString(" ")} s")
        val totalMs = last.values.map(_._2).sum / 1e6
        last.toSeq.sortBy(-_._2._2).foreach { case (op, (c, ns)) =>
          println(f"   $op%-18s n=$c%-6d ${ns / 1e6}%9.1f ms  (${ns / 1e3 / math.max(c, 1)}%8.1f us/op)")
        }
        println(f"   TOTAL tracked ${totalMs}%9.1f ms of last run")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("sjflat")) {
      // r17 skew A/B: the PRE-refinement streaming_join shape (plain
      // (user)-keyed interval join) timed on $sf, so the bucket-refined
      // default can be compared at matched ambient
      import org.apache.spark.sql.functions._
      val schema = spark.read.parquet(s"$sf/events.parquet").schema
      def run(): Double = {
        def src = spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sf)
        val ps = src
        val p = ps.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            graft.SparkEntry.tsTimestamp(ps).as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val cs = src
        val c = cs.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            graft.SparkEntry.tsTimestamp(cs).as("c_ts"))
          .withWatermark("c_ts", "2 hours")
        val qn = s"sjflat_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val t0 = System.nanoTime()
        try {
          val q = p.join(c,
              col("user_id") === col("c_user") &&
                col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
                col("c_ts") <= col("p_ts"))
            .select("purchase_id", "click_id")
            .writeStream.outputMode("append").format("memory").queryName(qn)
            .option("checkpointLocation", tmpDir("sjflat_ckpt"))
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.table(qn).count()
        dt
      }
      run() // warm
      println(f"sjflat: ${(1 to 3).map(_ => run()).map(t => f"$t%.2f").mkString(" ")} s")
      spark.stop(); return
    }
    if (args.headOption.contains("count")) {
      // row-count queries on $sf (r17: pins the OUTPUT size behind the
      // skew sweep's output-bound ratios)
      args.drop(1).foreach { n =>
        println(s"$n rows: ${graft.SparkEntry.queries(n)(spark, sf).count()}")
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


