package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Bisect the per-task FIXED cost of the envelope/coercion plan shape —
  * the number behind two reverted spreads (r18, re-measured r19): a
  * 32-way spread of the CDC envelope build multiplies task time ~30×
  * at constant row count, i.e. ~0.4-0.8 s of per-task setup whose
  * source BinProbe already cleared of task-binary size (<30 KiB).
  *
  * Method: the same 100k-row events scan, spread to 32 partitions, runs
  * a chain of noop-sink writes that add ONE operator family at a time
  * (bare project → envelope structs → SMT flatten → coercion → agg
  * partial). Σ executor run + deserialize time per arm, 3 runs, min.
  * The first arm whose Σtask jumps carries the fixed cost.
  */
object TaskCostBisect {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // page-size hypothesis arm: spark.buffer.pageSize is read at task-
    // memory-manager init, so it must land in the SparkConf BEFORE the
    // context exists — env-parameterized for the A/B
    val builder0 = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
    val builder = sys.env.get("SPARK_GRAFT_PAGESIZE")
      .fold(builder0)(ps => builder0.config("spark.buffer.pageSize", ps))
    val spark = builder.getOrCreate()
    sys.env.get("SPARK_GRAFT_PAGESIZE").foreach(ps => println(s"[bisect] pageSize=$ps"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.SparkEntry.tsMicros

    var runMs, deserMs = 0L
    var tasks = 0
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        runMs += sc.stageInfo.taskMetrics.executorRunTime
        deserMs += sc.stageInfo.taskMetrics.executorDeserializeTime
        tasks += sc.stageInfo.numTasks
      }
    }

    def measure(label: String, mk: () => DataFrame): Unit = {
      // warm once
      mk().write.format("noop").mode("overwrite").save()
      val results = (1 to 3).map { _ =>
        runMs = 0; deserMs = 0; tasks = 0
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
            .invoke(bus, java.lang.Long.valueOf(5000L))
        } catch { case _: Exception => Thread.sleep(300) }
        spark.sparkContext.removeSparkListener(listener)
        (wall, runMs, deserMs, tasks)
      }
      val bestRun = results.minBy(_._2)
      println(f"[bisect] $label%-34s wall ${bestRun._1}%6.3f s  Σrun ${bestRun._2 / 1000.0}%7.3f s  " +
        f"Σdeser ${bestRun._3 / 1000.0}%6.3f s  tasks ${bestRun._4}%3d")
    }

    val ev0 = spark.read.parquet(s"$sf/events.parquet")
    def ev = ev0.repartition(cpus.toInt)
    def evNarrow = ev0 // 1-split control

    val m = pmod(col("event_id"), lit(3))
    def envelope(d: DataFrame) = {
      val md = pmod(col("event_id"), lit(3))
      d.select(
        struct(col("event_id"), col("user_id"), col("event_type"), col("value")).as("data"),
        struct(
          when(md === 0, "insert").when(md === 1, "update").otherwise("delete").as("operation"),
          floor(tsMicros(ev0) / 1000).cast("string").as("timestamp"),
          lit("public").as("schema-name"),
          lit("events").as("table-name")).as("metadata"))
    }
    val chain = graft.transforms.Transforms.fromConfig(Map(
      "transforms" -> "dms", "transforms.dms.type" -> "DmsTransform"))
    def flat(d: DataFrame) = chain.foldLeft(envelope(d))((x, t) => t(x))
    def coerced(d: DataFrame) = {
      val f = flat(d)
      val target = graft.schema.SchemaEvolution.normalize(f.schema)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      graft.operators.Coercion.project(f, target)
    }
    def agged(d: DataFrame) = {
      val c = coerced(d)
        .withColumn("__op", lit("I"))
        .withColumn("__ord", col("event_id"))
      c.groupBy("event_id")
        .agg(max_by(struct(c.columns.map(col) :+ col("__op") :+ col("__ord"): _*), col("__ord"))
          .as("last"))
        .select(col("last.event_id"))
    }

    measure("A  spread -> project4 -> noop", () => ev.select("event_id", "user_id", "event_type", "value"))
    measure("B  spread -> envelope -> noop", () => envelope(ev))
    measure("C  spread -> +SMT flatten -> noop", () => flat(ev))
    measure("D  spread -> +coercion -> noop", () => coerced(ev))
    measure("E  spread -> +agg(max_by) -> noop", () => agged(ev))
    measure("F  narrow -> envelope (1 task)", () => envelope(evNarrow))
    measure("G  narrow -> +coercion (1 task)", () => coerced(evNarrow))
    measure("H  narrow -> +agg (1 task)", () => agged(evNarrow))

    // hypothesis arms: ObjectHashAggregate falls back to SORT-based
    // aggregation after 128 distinct keys in the hash map (default
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold) — the
    // fallback serializes every group's TypedImperative (max_by) buffer
    // into the external sorter, which would explain a per-task cost
    // proportional to groups-per-task, not a true fixed cost.
    val FbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(FbKey)
    spark.conf.set(FbKey, (1 << 22).toString)
    measure("E' spread agg, fallback 4M", () => agged(ev))
    measure("H' narrow agg, fallback 4M", () => agged(evNarrow))
    prev match { case Some(v) => spark.conf.set(FbKey, v); case None => spark.conf.unset(FbKey) }

    // operator-implementation arms
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    measure("E2 spread agg via SortAggregate", () => agged(ev))
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    measure("E3 spread agg, no WSCG", () => agged(ev))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    measure("E4 spread agg (repeat of E)", () => agged(ev))
    measure("A2 spread project4 (repeat of A)", () => ev.select("event_id", "user_id", "event_type", "value"))

    // decomposition arms: exchange-only vs primitive agg vs struct agg
    measure("I  spread -> repartition -> noop",
      () => ev.select("event_id", "user_id", "event_type", "value").repartition(cpus.toInt))
    measure("J  spread -> agg max(value) prim",
      () => ev.groupBy("event_id").agg(max("value")))
    measure("K  spread -> agg max(struct)",
      () => ev.groupBy("event_id")
        .agg(max(struct(col("event_id"), col("user_id"), col("event_type"), col("value"))).as("s"))
        .select(col("s.event_id")))
    measure("L  spread -> max_by 2 cols only",
      () => ev.groupBy("event_id")
        .agg(max_by(struct(col("user_id"), col("value")), col("event_id")).as("s"))
        .select(col("s.user_id")))
    spark.stop()
  }
}
