package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: scalar int8
  * quantization (the storage/compute format ANN systems serve from) and
  * per-group centroids (class prototypes for semantic filtering /
  * diversity sampling).
  *
  * Both are designed for the exchange conventions the rest of the engine
  * uses: integer outputs are exact; fractional outputs are emitted as
  * fixed-point micros via `floor(x*1e6 + 0.5)` (portable
  * round-half-up — both Java and DuckDB `round` have edge-case semantics
  * of their own, `floor(+0.5)` is identical everywhere).
  */
object Embeddings {

  /** Portable round-half-up to 1e-6 fixed point (BIGINT micros). */
  def micros(x: Column): Column = floor(x * lit(1e6) + lit(0.5)).cast("long")

  /** Symmetric per-vector int8 scalar quantization:
    * `scale = max(|x|)/127`, `q_i = round_half_up(x_i / scale)` —
    * all values land in [-127, 127]. A zero (or empty) vector quantizes
    * to all-zeros with scale 0.
    *
    * Output is long-form — one row per (vector, dimension):
    * (vec_id, pos, q, scale_micros). Long form keeps the exchange exact
    * (integer q per cell) and the operator map-side: a pure codegen'd
    * explode, no shuffle, scan-speed at 100 TB.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val amax = array_max(transform(vd, x => abs(x)))
    // no coalesce on amax: a vector whose elements are ALL NULL has a
    // NULL amax and must emit NULL q/scale rows (what the SQL oracle's
    // CASE arithmetic yields) — coalescing to 0 would fabricate
    // confident-looking zero quantizations for unscorable vectors
    df.select(
        col(idCol).as("vec_id"),
        vd.as("__v"),
        amax.as("__amax"))
      .withColumn("__scale", col("__amax") / lit(127.0))
      .select(
        col("vec_id"),
        micros(col("__scale")).as("scale_micros"),
        posexplode(when(col("__amax") === 0.0, transform(col("__v"), _ => lit(0L)))
          .otherwise(transform(col("__v"), x => floor(x / col("__scale") + lit(0.5)).cast("long")))))
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("col").as("q"),
        col("scale_micros"))
  }

  /** Elementwise mean of the RAW embedding per group — the prototype
    * vector of each class/source/language. Long-form output
    * (group, pos, centroid_micros, n_members): fixed-point micros absorb
    * sum-order float variation across engines/partitionings.
    *
    * 100 TB shape: one explode + ONE hash-partitioned aggregation on
    * (group, pos) with map-side partial aggs; no window, no join. Group
    * count × dim rows come back — index-sized.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("group"),
        posexplode(transform(col(vecCol), x => x.cast("double"))))
      .groupBy(col("group"), col("pos").cast("long").as("pos"))
      .agg(micros(avg(col("col"))).as("centroid_micros"),
        count(lit(1)).as("n_members"))
}
