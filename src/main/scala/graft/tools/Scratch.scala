package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // drive decimal truncate over real testdata through the public API
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("price_dec", col("o_totalprice").cast(DecimalType(12, 2)))
    val t = graft.operators.PartitionTransforms.Truncate("price_dec", 1000, DecimalType(12, 2))
    o.select(col("o_orderkey"), col("price_dec"), t.column(col("price_dec")).as("trunc"))
      .orderBy("o_orderkey").show(5, false)
    spark.stop()
  }
}
