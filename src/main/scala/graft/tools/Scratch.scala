package graft.tools

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("streaming_window")(spark, "/root/testdata/sf0.1").count()
      println(f"r$r streaming_window rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
