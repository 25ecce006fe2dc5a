package graft.tools

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_embedding_lsh")
    // warm
    names.foreach(n => graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sf).count()
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
