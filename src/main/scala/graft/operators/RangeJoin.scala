package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without an equi-key — the other
  * classic operator Spark lacks: naively it plans as a broadcast
  * nested-loop / cross join, |points| × |intervals| comparisons.
  *
  * Bucketization makes it a hash join: every interval is exploded into
  * the fixed-width buckets it covers, every point hashes to its one
  * bucket, the join runs on bucket equality, and the exact BETWEEN
  * filter runs only on co-bucketed candidates. Each (point, interval)
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
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
