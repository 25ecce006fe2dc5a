package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without an equi-key — the other
  * classic operator Spark lacks: naively it plans as a broadcast
  * nested-loop / cross join, |points| × |intervals| comparisons.
  *
  * Bucketization makes it a hash join: every interval is exploded into
  * the fixed-width buckets it covers, every point hashes to its one
  * bucket, the join runs on bucket equality, and the exact half-open
  * `lo <= p < hi` filter runs only on co-bucketed candidates (hi itself
  * does NOT match — interval chains tile without double-counting the
  * boundary point). Each (point, interval)
  * match meets in exactly one bucket (the point's), so no dedup is
  * needed. Candidate volume ≈ Σ interval-span/width per point-density —
  * linear, shuffle-partitioned, skew handled by AQE like any hash join.
  *
  * `bucketWidth` tunes candidate quality: ~the median interval span is
  * a good default (≤1 extra bucket per interval, few false candidates).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "column name __bucket is reserved by the range-join implementation")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    // an inverted interval (hi < lo) matches nothing under [lo, hi), but
    // sequence(start, stop) DEFAULTS TO STEP -1 when start > stop — one
    // corrupt row would explode into span/width junk candidates (or a
    // "too long sequence" crash) instead of zero. The filter also drops
    // null-bounded intervals, which sequence(null, ...) would drop anyway.
    val iv = intervals.filter(col(loCol) <= col(hiCol)).withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
