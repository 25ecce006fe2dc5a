package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single most recent
  * right row with `right.ts <= left.ts` on the same key. The operator
  * Spark famously lacks; DuckDB/kdb expose it natively (`ASOF JOIN`),
  * which is exactly what the oracle uses.
  *
  * Shape: ONE hash shuffle on the key. Both sides are tagged and
  * unioned, sorted within each key by (ts, side) — right rows first at
  * equal timestamps, giving `<=` semantics — and the latest right
  * payload is carried forward with `last(ignoreNulls)` over a running
  * window. Never a range cross-join (quadratic per key), never a per-key
  * collect; skew in left-row counts spreads across the sort naturally.
  *
  * The right side must be unique per (key, ts) — pre-aggregate to a
  * deterministic representative first (e.g. `max_by`), or the "most
  * recent" row would be ambiguous in ANY engine.
  */
object AsofJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"right payload columns ${payloadCols.intersect(leftCols)} collide with left columns")
    val carried = leftCols.filterNot(c => c == keyCol || c == tsCol)

    val l = left.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        carried.map(col) ++
        payloadCols.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        carried.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(col): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(l.unionByName(r)) { (d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0).drop("__side")
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
