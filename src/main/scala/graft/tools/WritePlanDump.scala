package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{GraftSession, SparkEntry}

/** Dump the EXECUTED (AQE-final) plans of write commands that run inside
  * a query's fixture work —
  * `sbt "runMain graft.tools.WritePlanDump <outDir> <suffix> <query> <substr>"`
  * runs the named query once and writes
  * `<outDir>/<query>__write<k>_<suffix>.txt` for every completed write
  * whose formatted plan contains `<substr>` (e.g. `postings`, or a table
  * dir fragment like `events_part`).
  *
  * [[PlanDump]] captures the declared query's final READ; changes that
  * live inside an index build or a table write (exchange placement,
  * AQE-coalesced task counts) are invisible there. This tool records the
  * plan the write actually executed, post-AQE — `AQEShuffleRead` nodes
  * included — which is the artifact the §6 fan-out claims are checked
  * against.
  */
object WritePlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: WritePlanDump <outDir> <suffix> <query> <substr>")
    val Array(outDir, suffix, name, substr) = args
    require(SparkEntry.queries.contains(name), s"unknown query: $name")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val captured = mutable.ArrayBuffer[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val txt =
          try qe.explainString(org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"<explain failed: ${e.getMessage}>" }
        if (txt.contains(substr)) captured.synchronized { captured += txt; () }
      }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    SparkEntry.queries(name)(spark, sf).count()
    // listener events are delivered asynchronously; give the bus a moment
    Thread.sleep(1000)
    spark.listenerManager.unregister(listener)
    captured.zipWithIndex.foreach { case (txt, i) =>
      val f = Paths.get(outDir, s"${name}__write${i}_$suffix.txt")
      Files.write(f, txt.getBytes(StandardCharsets.UTF_8))
      println(s"[writeplandump] wrote $f")
    }
    if (captured.isEmpty)
      System.err.println(s"[writeplandump] NO write plan matched '$substr' for $name")
    spark.stop()
  }
}
