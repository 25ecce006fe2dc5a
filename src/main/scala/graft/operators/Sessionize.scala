package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each key's event stream into sessions at
  * gaps larger than `gapUs`, one output row per session.
  *
  * Batch formulation is pure window functions (lag → new-session flag →
  * running sum as session id → group), i.e. exactly one hash shuffle on
  * the key plus a per-key sort — fully codegen'd, no per-group
  * imperative code. The streaming twin with explicit state lives in
  * [[graft.streaming.Sessionize]] (flatMapGroupsWithState) and shares
  * the same gap rule.
  */
object Sessionize {

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  /** One row per (key, session): session_id (0-based per key, in time
    * order), start/end timestamps, and the event count. Rows with a null
    * timestamp are dropped (they belong to no session).
    */
  def sessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapUs: Long = DefaultGapUs
  ): DataFrame = {
    // the emitted session_id (and the internal lag/flag columns) must not
    // collide with input columns — withColumn would silently REPLACE a
    // pre-existing session_id and group on the computed one
    Seq("session_id", "__prev", "__new_s")
      .foreach(Sampling.requireFreshColumn(df, _, "Sessionize.sessions"))
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val ts: Column = col(tsCol)
    // a NULL timestamp cannot belong to any session: unfiltered it sorts
    // first, seeds a spurious null-bounded session, and shifts every real
    // session's id — same rule AsofJoin applies to its null timestamps
    df.filter(ts.isNotNull)
      .withColumn("__prev", lag(ts, 1).over(byTime))
      .withColumn("__new_s",
        when(col("__prev").isNull || ts - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_s")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(ts).as("start_us"),
        max(ts).as("end_us"),
        count(lit(1)).as("events"))
  }
}
