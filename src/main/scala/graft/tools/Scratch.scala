package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad — run with `sbt "runMain graft.tools.Scratch"`. Not part
  * of the engine surface; edit freely to probe behavior (sbt console
  * cannot host a SparkSession — see .claude/skills/verify/SKILL.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // warm
    graft.SparkEntry.queries("ingest_partitioned")(spark, "/root/testdata/sf0.001").count()

    import graft.config.{EngineConfig, TableConfig}
    import graft.sink.Ingest
    import graft.table.IceTable
    (1 to 3).foreach { rep =>
      val wh = java.nio.file.Files.createTempDirectory("scratch-ip").toString
      val cfg = EngineConfig(
        warehouse = wh,
        tables = Seq(TableConfig("events_part", partitionBy = Seq("day(ts_t)", "event_type"))),
        autoCreate = true
      )
      val ev = spark.read.parquet(s"$sf/events.parquet")
        .withColumn("ts_t", timestamp_micros((col("ts") / 1000).cast("long")))
      def ms[T](tag: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[$rep] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      ms("ingest")(Ingest.run(spark, ev, 0L, cfg))
      val t = IceTable.load(s"$wh/events_part")
      println(s"[$rep] files: ${t.log.commits().head.dataFiles.size}")
      ms("scan")(t.scan(spark, Some(pv =>
        pv.get("ts_t_day").contains("2024-01-03") && pv.get("event_type").contains("purchase")))
        .count())
    }
    spark.stop()
  }
}
