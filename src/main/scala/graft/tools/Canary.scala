package graft.tools

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Standalone runner for the Bench ambient-load canary (the EXACT job
  * Bench times at start/end): run on a QUIET machine to cross-check
  * `Bench.AmbientRef`. Prints 5 timed runs after one warmup; the floor
  * is the min.
  *
  * JVM-warmth caveat (r18): this JVM only warms the canary job itself,
  * while Bench's canary runs after the full query warmup sweep — the
  * standalone floor reads ~0.1 s HIGHER than the in-bench value on the
  * same hardware (measured 0.60 standalone vs 0.478–0.51 in-bench).
  * For recalibration, prefer the ambient.start/end of a quiet Bench
  * run's BENCH_out.json; use this tool to confirm the machine is quiet
  * and the order of magnitude.
  */
object Canary {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 4000000000L, 1L, cpus.toInt)
        .select(sum(xxhash64(col("id")))).head()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm codegen
    val ts = (1 to 5).map(_ => once())
    println(ts.map(t => f"$t%.3f").mkString("canary runs: ", " ", " s"))
    println(f"canary min (use as Bench.AmbientRef on a quiet machine): ${ts.min}%.3f")
    spark.stop()
  }
}
