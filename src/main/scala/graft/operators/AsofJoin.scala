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
    require(!leftCols.contains("__side") && !leftCols.contains("__r") &&
      !payloadCols.contains("__side") && !payloadCols.contains("__r"),
      "column names __side/__r are reserved by the as-of implementation")
    val carried = leftCols.filterNot(c => c == keyCol || c == tsCol)

    // the payload rides as ONE struct so the carry is atomic per right
    // ROW: a most-recent right row with a NULL field must yield that
    // NULL, never a stale value torn from an older row (per-column
    // last(ignoreNulls) would do exactly that)
    val rStructType = org.apache.spark.sql.types.StructType(
      payloadCols.map(p => right.schema(p).copy(name = p)))
    val l = left.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        carried.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    // join-key semantics: NULL keys and NULL timestamps never match — a
    // NULL-ts right row would otherwise sort first and leak everywhere,
    // and NULL-key rows would "join" inside the null window partition
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
          carried.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payloadCols.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++ payloadCols.map(p => col(s"__r.$p").as(p)): _*)
  }
}
