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
    * values. CAVEAT: a constant (or low-cardinality) value column hashes
    * to one (or few) bucket(s) — no spread. Use [[spreadSalt]] when the
    * value distribution is unknown.
    */
  def salt(value: Column, buckets: Int): Column =
    pmod(xxhash64(value), lit(buckets.toLong))

  /** Salt with GUARANTEED spread regardless of the value distribution:
    * hashes the value together with the row's position id, so even a
    * constant value column (collecting a status flag per hot key) fans
    * out over all `buckets`. Position-dependent, so not stable across
    * repartitions — only safe where bucket assignment doesn't affect the
    * result (e.g. [[collectSorted]], whose final array is sorted).
    * Must be materialized via `withColumn` before a groupBy (Spark
    * rejects nondeterministic grouping expressions).
    *
    * RETRY CAVEAT (the SPARK-23207 hazard class): because the salt feeds
    * a shuffle GROUPING key, a stage retry after shuffle-fetch failure can
    * recompute map tasks with DIFFERENT position ids than reducers already
    * fetched — duplicating or dropping rows. Output determinism (covered
    * above) is a weaker property than retry safety. Any consumer MUST
    * materialize the salted frame (`localCheckpoint()`) before grouping on
    * it so retries replay the stored salt instead of re-deriving it —
    * [[collectSorted]] does this by default (`retrySafe = true`).
    */
  def spreadSalt(value: Column, buckets: Int): Column =
    pmod(xxhash64(value, monotonically_increasing_id()), lit(buckets.toLong))

  /** Two-phase salted `collect_list`, returned SORTED (deterministic
    * output — a distributed collect has no stable arrival order, so an
    * unsorted result would differ run to run). Output: `keyCols` plus
    * `outCol` = sorted array of `valueCol`.
    *
    * Salting uses [[spreadSalt]] (value ⊕ row position), not a pure
    * value hash: the classic hot-key shape collects a LOW-cardinality
    * value (a status flag) under one hot key, and a value-only hash
    * would land every row of that key in a single salt bucket —
    * serializing the first stage exactly as an unsalted collect would.
    * Bucket assignment never reaches the result (the final array is
    * sorted), so the position-dependence is safe for OUTPUT determinism.
    *
    * Retry safety is the stronger property and is ON by default: the
    * salted frame is `localCheckpoint()`ed before the groupBy, so a stage
    * retry after a shuffle-fetch failure replays the MATERIALIZED salt
    * instead of re-deriving different position ids than reducers already
    * fetched (SPARK-23207 — silent row duplication/loss). Cost: one extra
    * materialization of (keys, value, salt). If an executor holding
    * checkpoint blocks dies, the job fails LOUDLY (lineage is truncated)
    * rather than corrupting — the correct trade on a real cluster.
    * `retrySafe = false` skips the checkpoint for single-process
    * exploratory use where shuffle-fetch failures cannot occur.
    */
  def collectSorted(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      outCol: String,
      saltBuckets: Int = 32,
      retrySafe: Boolean = true
  ): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(!keyCols.contains("__salt") && valueCol != "__salt" &&
      !df.columns.contains("__salt") && !df.columns.contains("__part"),
      "column names __salt/__part are reserved by the salted collect")
    // an outCol colliding with a key column would silently emit two
    // columns of the same name (ambiguous downstream) — same fresh-name
    // contract as Sampling's split/mix_pos/rk outputs
    require(!keyCols.contains(outCol),
      s"collectSorted: outCol '$outCol' collides with a key column")
    // project BEFORE the checkpoint so only (keys, value, salt) is
    // materialized, not every input column
    val salted0 = df
      .select((keyCols :+ valueCol).distinct.map(col): _*)
      .withColumn("__salt", spreadSalt(col(valueCol), saltBuckets))
    val salted = if (retrySafe) salted0.localCheckpoint() else salted0
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(collect_list(col(valueCol)).as("__part"))
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(flatten(collect_list(col("__part")))).as(outCol))
  }
}
