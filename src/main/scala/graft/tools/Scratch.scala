package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    val withParts = ev
      .withColumn("ts_t_day", date_format(col("ts_t"), "yyyy-MM-dd"))
    println(s"rows=${ev.count()} partitions=${withParts.select("ts_t_day", "event_type").distinct().count()}")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def freshDir(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"scratch-$tag")
      d.toFile.deleteOnExit(); d.toString
    }
    for (round <- 1 to 2) {
      time(s"r$round repartition(parts)") {
        withParts.repartition(col("ts_t_day"), col("event_type"))
          .write.partitionBy("ts_t_day", "event_type").parquet(freshDir("a") + "/t")
      }
      time(s"r$round rebalance(parts)") {
        withParts.hint("rebalance", "ts_t_day", "event_type")
          .write.partitionBy("ts_t_day", "event_type").parquet(freshDir("b") + "/t")
      }
      time(s"r$round salt4") {
        withParts.repartition((Seq(col("ts_t_day"), col("event_type")) :+
          pmod(xxhash64(col("event_id")), lit(4))): _*)
          .write.partitionBy("ts_t_day", "event_type").parquet(freshDir("c") + "/t")
      }
      time(s"r$round no-repart") {
        withParts.write.partitionBy("ts_t_day", "event_type").parquet(freshDir("d") + "/t")
      }
    }
    spark.stop()
  }
}
