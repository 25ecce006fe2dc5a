package graft.tools

import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("plan-wh").toString
    val t = graft.table.IceTable.create(s"$wh/t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))),
      graft.table.TableMeta(idColumns = Seq("id")))
    graft.sink.IceTableWriter.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, 0)
    graft.sink.IceTableWriter.delta(spark, Seq((2L, "b2")).toDF("id", "v"), Seq(2L).toDF("id"), t, 1)
    val df = t.read(spark)
    df.explain("formatted")
    df.show(false)
    spark.stop()
  }
}
