package graft.tools

import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val props = Map(
      "transforms" -> "mongo",
      "transforms.mongo.type" -> "MongoDebeziumTransform")
    val chain = graft.transforms.Transforms.fromConfig(props)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('c', CAST(NULL AS STRING), '{"_id": 1, "name": "ada", "age": 36}',
        |   CAST(NULL AS STRUCT<updatedFields: STRING, removedFields: ARRAY<STRING>>),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(1000 AS LONG), CAST(0 AS LONG)),
        |  ('u', '{"_id": 1, "name": "ada", "age": 36}', CAST(NULL AS STRING),
        |   named_struct('updatedFields', '{"age": 37}', 'removedFields', CAST(NULL AS ARRAY<STRING>)),
        |   named_struct('db', 'appdb', 'collection', 'users'), CAST(2000 AS LONG), CAST(1 AS LONG))
        |AS t(op, before, after, updateDescription, source, ts_ms, offset)""".stripMargin)
    val flat = chain.foldLeft(df)((d, t) => t(d))
    flat.printSchema()
    val wh = java.nio.file.Files.createTempDirectory("mongo-wh").toString
    val cfg = graft.config.EngineConfig(warehouse = wh,
      tables = Seq(graft.config.TableConfig("users", idColumns = Seq("_id"))),
      cdcField = Some("_cdc.op"), autoCreate = true)
    graft.sink.Ingest.run(spark, df, 0L, cfg, transforms = chain)
    val t = graft.table.IceTable.load(s"$wh/users")
    println("table schema: " + t.schema.treeString)
    val file = t.log.commits().head.dataFiles.head.path
    println("file schema: " + spark.read.parquet(file).schema.treeString)
    t.read(spark).show(false)
    spark.stop()
  }
}
