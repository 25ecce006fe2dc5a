package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single closest right
  * row on the same key: the most recent with `right.ts <= left.ts`
  * (`direction = "backward"`, the default) or the earliest with
  * `right.ts >= left.ts` (`"forward"`). The operator Spark famously
  * lacks; DuckDB/kdb expose it natively (`ASOF JOIN`), which is exactly
  * what the oracle uses. An optional `tolerance` bounds how far the
  * match may be from the left timestamp (pandas `merge_asof` semantics):
  * a match outside the band yields NULL payload, never a far-away row.
  *
  * Shape: ONE hash shuffle on the key. Both sides are tagged and
  * unioned, sorted within each key by (ts, side) — right rows first at
  * equal timestamps, giving `<=`/`>=` semantics; forward direction is
  * the same pass over reversed time — and the latest right payload is
  * carried forward with `last(ignoreNulls)` over a running window. Never
  * a range cross-join (quadratic per key), never a per-key collect; skew
  * in left-row counts spreads across the sort naturally. The tolerance
  * is a post-carry column compare — it costs nothing extra.
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
      payloadCols: Seq[String],
      direction: String = "backward",
      /** max |left.ts - right.ts| for a match to count, in the ts
        * column's own units; None = unbounded (classic as-of) */
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof direction must be backward|forward, got '$direction'")
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"right payload columns ${payloadCols.intersect(leftCols)} collide with left columns")
    require(!leftCols.contains("__side") && !leftCols.contains("__r") &&
      !payloadCols.contains("__side") && !payloadCols.contains("__r"),
      "column names __side/__r are reserved by the as-of implementation")
    // a payload column named __asof_ts would create a duplicate struct
    // field, and the tolerance compare could silently resolve to the
    // payload copy — wrong in-band decisions instead of an error
    require(!payloadCols.contains("__asof_ts"),
      "payload column name __asof_ts is reserved by the as-of implementation")
    val carried = leftCols.filterNot(c => c == keyCol || c == tsCol)

    // the payload rides as ONE struct so the carry is atomic per right
    // ROW: a most-recent right row with a NULL field must yield that
    // NULL, never a stale value torn from an older row (per-column
    // last(ignoreNulls) would do exactly that). The matched right ts
    // rides in the same struct for the tolerance compare.
    val rStructType = org.apache.spark.sql.types.StructType(
      payloadCols.map(p => right.schema(p).copy(name = p)) :+
        right.schema(tsCol).copy(name = "__asof_ts"))
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
          struct(payloadCols.map(col) :+ col(tsCol).as("__asof_ts"): _*).as("__r"): _*)

    val order =
      if (direction == "backward") Seq(col(tsCol).asc, col("__side").desc)
      else Seq(col(tsCol).desc, col("__side").desc)
    val w = Window.partitionBy(keyCol)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBand = tolerance match {
      case None => lit(true)
      case Some(t) =>
        // TIMESTAMP ts columns: timestamp - timestamp is a DayTimeInterval,
        // which cannot compare to the Long tolerance — the analysis error
        // surfaced only when a caller ADDED a tolerance (the no-tolerance
        // path accepts timestamps fine). Compare in epoch micros instead,
        // so `tolerance` is uniformly "ts units" (micros for timestamps).
        val toNum: Column => Column = left.schema(tsCol).dataType match {
          case org.apache.spark.sql.types.TimestampType =>
            c => unix_micros(c)
          case org.apache.spark.sql.types.TimestampNTZType =>
            // NTZ → micros through a UTC-PINNED cast (unix_micros takes
            // TIMESTAMP only): a session-timezone cast applies an offset
            // that is NOT constant across a DST transition — two wall
            // clocks straddling spring-forward would see their gap shrink
            // or grow by the DST delta, and ambiguous fall-back times
            // make the cast non-injective. Pinning the zone makes the
            // conversion a pure, monotone wall-clock → micros map.
            c => unix_micros(org.apache.spark.sql.GraftInternal.column(
              org.apache.spark.sql.catalyst.expressions.Cast(
                org.apache.spark.sql.GraftInternal.expression(c),
                org.apache.spark.sql.types.TimestampType,
                Some("UTC"))))
          case _ => identity
        }
        val gap =
          if (direction == "backward") toNum(col(tsCol)) - toNum(col("__r.__asof_ts"))
          else toNum(col("__r.__asof_ts")) - toNum(col(tsCol))
        gap <= t
    }
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      // the explicit left-ts null guard matters for FORWARD direction:
      // its DESC ordering sorts NULL timestamps LAST, so a NULL-ts left
      // row sits after every right row and would carry the earliest
      // payload — backward's ASC (nulls first) masks this by accident.
      // "NULL timestamps never match" must hold symmetrically.
      .select(leftCols.map(col) ++
        payloadCols.map(p => when(col(tsCol).isNotNull && inBand, col(s"__r.$p")).as(p)): _*)
  }
}
