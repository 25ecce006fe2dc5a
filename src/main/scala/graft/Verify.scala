package graft
import org.apache.spark.sql.types.{ArrayType, MapType, StructType, StructField}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Top-level columns the driver's pandas comparator cannot sort:
    * array/map/struct cells become numpy objects and `sort_values`
    * throws "unhashable type" BEFORE comparing — the query then ships
    * with no oracle signal at all (the r8 `agg_collect` failure class).
    * Every query output must be scalar-columned; serialize nested values
    * (concat_ws / to_json) at the final projection.
    */
  def nestedTopLevelCols(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case StructField(n, _: ArrayType, _, _)  => n
      case StructField(n, _: MapType, _, _)    => n
      case StructField(n, _: StructType, _, _) => n
    }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — trailing names restrict the
    // run to a subset (local iteration); the driver always passes two args
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the SHARED session factory, same as Bench: a hand-rolled builder
    // here omitted GraftExtensions + the engine conf set, so any future
    // setting added to GraftSession would apply in bench runs but not
    // verify runs — the two harnesses must not drift
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fresh-run contract: stale dumps from a previous run (a renamed or
    // since-removed query, or THIS run's failure overlapping last run's
    // success) must not survive for the driver to read as current.
    // FULL runs wipe the whole dir; a subset run ([queryName...] local
    // iteration) wipes only its own queries' products — wiping
    // everything would destroy the other ~129 dumps of the last full
    // run, silently shorting the next DuckDB compare over the dir.
    val outPath = Paths.get(outDir)
    if (Files.isDirectory(outPath)) {
      import scala.jdk.CollectionConverters._
      val doomed: java.nio.file.Path => Boolean =
        if (only.isEmpty) (p: java.nio.file.Path) => p != outPath
        else { p =>
          val rel = outPath.relativize(p)
          val head = rel.getName(0).toString
          only.contains(head) || only.contains(head.stripSuffix(".schema.json"))
        }
      val walk = Files.walk(outPath)
      try walk.iterator().asScala.toSeq.reverse
        .filter(p => p != outPath && doomed(p)).foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    new java.io.File(outDir).mkdirs()
    // a thrown query is recorded (and the process exits non-zero at the
    // end) — r7 shipped 11 broken queries because failures were swallowed
    // here, leaving the driver's correctness board silently short.
    val failed = scala.collection.mutable.Buffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val nested = nestedTopLevelCols(df.schema)
        if (nested.nonEmpty)
          throw new IllegalStateException(
            s"output has non-scalar top-level column(s) ${nested.mkString(", ")} — " +
              "the driver's pandas comparator cannot sort these; serialize them " +
              "(concat_ws/to_json) in the final projection")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // schema sidecar: the EXACT Catalyst schema of the dumped result,
        // so a schema check never has to depend on parquet type-inference
        // quirks (the r7 TIMESTAMP_NTZ episode in a different guise)
        Files.writeString(Paths.get(s"$outDir/$name.schema.json"), df.schema.json)
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      }
      // same per-query release Bench does: localCheckpoint-pinned blocks,
      // cached plans, and streaming memory-sink temp views otherwise
      // accumulate across ~130 queries — late-alphabet queries at large
      // sf pay eviction pressure their standalone runs never see
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      val ran =
        if (only.isEmpty) SparkEntry.queries.size
        else SparkEntry.queries.count { case (n, _) => only.contains(n) }
      System.err.println(
        s"[verify] FAILED ${failed.size}/$ran: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
