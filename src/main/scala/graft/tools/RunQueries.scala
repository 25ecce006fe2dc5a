package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: run named SparkEntry queries standalone and print row counts
  * and wall times. Usage (sbt):
  *
  *   runMain graft.tools.RunQueries [--sf DIR] [--repeat N] [name ...]
  *
  * With no names, runs every query. Exits non-zero if any query throws —
  * the same loud-failure contract as Bench/Verify.
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    var sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var repeat = 1
    var dump: Option[String] = None
    val names = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf"     => sfDir = args(i + 1); i += 2
        case "--repeat" => repeat = args(i + 1).toInt; i += 2
        case "--dump"   => dump = Some(args(i + 1)); i += 2
        case n          => names += n; i += 1
      }
    }
    val spark = GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> SparkEntry.queries(n))
    var failed = 0
    for (r <- 1 to repeat; (name, fn) <- selected) {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        val c = dump match {
          case Some(dir) =>
            df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
            spark.read.parquet(s"$dir/$name").count()
          case None => df.count()
        }
        println(f"OK   $name%-30s rows=$c%-8d ${(System.nanoTime() - t0) / 1e9}%.3fs")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"FAIL $name ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
      }
    }
    spark.stop()
    if (failed > 0) { System.err.println(s"FAILED $failed queries"); sys.exit(1) }
  }
}
