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
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (advisory <- Seq("64m", "8m", "1m"); r <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      println(s"advisory=$advisory round $r")
      val wh = java.nio.file.Files.createTempDirectory("scr").toString
      val cfg = graft.config.EngineConfig(
        warehouse = wh,
        tables = Seq(graft.config.TableConfig("events_part",
          partitionBy = Seq("day(ts_t)", "event_type"))),
        autoCreate = true)
      val ev = spark.read.parquet(s"$sf/events.parquet")
        .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
      time("ingest") { graft.sink.Ingest.run(spark, ev, 0L, cfg) }
      time("scan") {
        graft.table.IceTable.load(s"$wh/events_part")
          .scan(spark, Some(pv => pv.get("ts_t_day").contains("2024-01-03") &&
            pv.get("event_type").contains("purchase")))
          .count()
      }
    }
    spark.stop()
  }
}
