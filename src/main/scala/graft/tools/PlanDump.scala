package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for named queries to files —
  * `sbt "runMain graft.tools.PlanDump <outDir> <suffix> <names...>"`
  * writes `<outDir>/<name>_<suffix>.txt` per query (the judge-facing
  * plans/r18 artifacts). Each query function RUNS its fixture work
  * (table writes, index builds, streams) before returning the result
  * frame, so the dumped plan is the declared query's final read — the
  * frame whose hash the oracle checks — built against the same sf dir
  * the bench uses (`SPARK_GRAFT_SF_DIR`, default sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names...|all>")
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    var failed = 0
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
