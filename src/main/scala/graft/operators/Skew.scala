package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-tolerant aggregation helpers.
  *
  * Algebraic aggregates (sum/count/min/max/avg) survive hot keys for
  * free — Spark's partial aggregation shrinks them map-side, and AQE
  * rebalances skewed shuffle joins at runtime. HOLISTIC aggregates get
  * neither: a `collect_list` partial is as large as its input, so one
  * hot key funnels its entire payload through a single reduce task and
  * the stage runs at the speed of that task.
  *
  * [[collectSorted]] restores balance by salting the heavy stage:
  * pre-aggregate on (key, salt(value)) so the hot key's rows spread over
  * `saltBuckets` tasks, then merge the per-salt arrays per key. The
  * total bytes shuffled are unchanged, but the first (heavy) shuffle is
  * uniform, and the second moves one pre-built array per (key, salt)
  * instead of one row per input. The final per-key array assembly is
  * inherent to the result shape — no strategy avoids it — but it now
  * concatenates `saltBuckets` arrays rather than sorting n rows.
  */
object Skew {

  /** Deterministic salt for a value expression: stable across runs (hash
    * of the value, not the partition), near-uniform for non-constant
    * values.
    */
  def salt(value: Column, buckets: Int): Column =
    pmod(xxhash64(value), lit(buckets.toLong))

  /** Two-phase salted `collect_list`, returned SORTED (deterministic
    * output — a distributed collect has no stable arrival order, so an
    * unsorted result would differ run to run). Output: `keyCols` plus
    * `outCol` = sorted array of `valueCol`.
    */
  def collectSorted(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      outCol: String,
      saltBuckets: Int = 32
  ): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(!keyCols.contains("__salt") && valueCol != "__salt" && !df.columns.contains("__part"),
      "column names __salt/__part are reserved by the salted collect")
    df.groupBy(keyCols.map(col) :+ salt(col(valueCol), saltBuckets).as("__salt"): _*)
      .agg(collect_list(col(valueCol)).as("__part"))
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(flatten(collect_list(col("__part")))).as(outCol))
  }
}
