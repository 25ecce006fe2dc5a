package graft.tools

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("dedup_minhash", "dedup_simhash", "ingest_partitioned")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"$q%-20s rows=$n%-6d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
