package graft.tools

import org.apache.spark.SparkEnv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** How fat is a stage's task binary? — approximates what DAGScheduler
  * ships per task (`closureSerializer.serialize((stage.rdd, func))`) by
  * serializing `df.queryExecution.toRdd` for representative frames of
  * the ingest/CDC family. Plan-time only (no jobs). The r18 spread
  * reverts blamed a ~2.4 MB task binary for the per-task fixed cost that
  * made 32-way spreads of the envelope/coercion stages regress; this
  * probe locates the bytes.
  */
object BinProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[4]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.SparkEntry.tsMicros

    def sizeOf(label: String, df: DataFrame): Unit = {
      val rdd = df.queryExecution.toRdd
      val ser = SparkEnv.get.closureSerializer.newInstance()
      val n = ser.serialize[AnyRef](rdd).limit()
      println(f"[binprobe] $label%-40s ${n / 1024.0}%10.1f KiB  (${rdd.getNumPartitions} parts)")
    }

    val ev = spark.read.parquet(s"$sf/events.parquet")
    sizeOf("events scan", ev)
    sizeOf("events select 4 cols",
      ev.select(col("event_id"), col("user_id"), col("event_type"), col("value")))

    // the transform_dms envelope (pre-transform)
    val m = pmod(col("event_id"), lit(3))
    val env = ev.select(
      struct(col("event_id"), col("user_id"), col("event_type"), col("value")).as("data"),
      struct(
        when(m === 0, "insert").when(m === 1, "update").otherwise("delete").as("operation"),
        floor(tsMicros(ev) / 1000).cast("string").as("timestamp"),
        lit("public").as("schema-name"),
        lit("events").as("table-name")).as("metadata"))
    sizeOf("dms envelope", env)

    val chain = graft.transforms.Transforms.fromConfig(Map(
      "transforms" -> "dms", "transforms.dms.type" -> "DmsTransform"))
    val flattened = chain.foldLeft(env)((d, t) => t(d))
    sizeOf("dms envelope + SMT flatten", flattened)

    // coercion onto a target schema (the ingest projection)
    val target = graft.schema.SchemaEvolution.normalize(flattened.schema)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    sizeOf("dms flatten + coercion",
      graft.operators.Coercion.project(flattened, target))

    // partitioned ingest shape: events + ts_t + derived partition cols
    val evTs = ev.withColumn("ts_t", graft.SparkEntry.tsTimestamp(ev))
    sizeOf("events + ts_t", evTs)

    // What actually ships: run a real CDC ingest and a partitioned ingest,
    // then list the largest broadcast blocks in the block manager — task
    // binaries are broadcast_N pieces, so the fat stage is visible by size.
    val wh = java.nio.file.Files.createTempDirectory("binprobe").toString
    val chain2 = graft.transforms.Transforms.fromConfig(Map(
      "transforms" -> "dms", "transforms.dms.type" -> "DmsTransform"))
    val cfg = graft.config.EngineConfig(
      warehouse = wh,
      tables = Seq(graft.config.TableConfig("state", idColumns = Seq("event_id"))),
      cdcField = Some("_cdc.op"),
      autoCreate = true)
    graft.sink.Ingest.run(spark, env, 0L, cfg, transforms = chain2)
    val cfg2 = graft.config.EngineConfig(
      warehouse = wh,
      tables = Seq(graft.config.TableConfig(
        "events_part", partitionBy = Seq("day(ts_t)", "event_type"))),
      autoCreate = true)
    graft.sink.Ingest.run(spark, evTs, 1L, cfg2)
    val bm = SparkEnv.get.blockManager
    val blocks = bm.getMatchingBlockIds(_.isBroadcast)
      .flatMap(id => bm.getStatus(id).map(s => (id.toString, s.memSize + s.diskSize)))
      .sortBy(-_._2)
    println(s"[binprobe] broadcast blocks: ${blocks.size}; top 12 by size:")
    blocks.take(12).foreach { case (id, sz) =>
      println(f"[binprobe]   $id%-24s ${sz / 1024.0}%10.1f KiB")
    }
    spark.stop()
  }
}
