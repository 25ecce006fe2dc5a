package graft.tools

import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    ev.count()

    val withParts = ev
      .withColumn("__p_day", date_format(col("ts_t"), "yyyy-MM-dd"))
      .withColumn("__p_type", col("event_type"))

    val out1 = java.nio.file.Files.createTempDirectory("w1").toString
    time("bare partitioned write") {
      withParts.repartition(col("__p_day"), col("__p_type"))
        .write.partitionBy("__p_day", "__p_type").parquet(out1 + "/d")
    }
    val out2 = java.nio.file.Files.createTempDirectory("w2").toString
    time("bare partitioned write 2nd") {
      withParts.repartition(col("__p_day"), col("__p_type"))
        .write.partitionBy("__p_day", "__p_type").parquet(out2 + "/d")
    }
    val out3 = java.nio.file.Files.createTempDirectory("w3").toString
    time("no-repartition write") {
      withParts.write.partitionBy("__p_day", "__p_type").parquet(out3 + "/d")
    }
    val out4 = java.nio.file.Files.createTempDirectory("w4").toString
    time("unpartitioned write") {
      ev.write.parquet(out4 + "/d")
    }
    spark.stop()
  }
}
