package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.HotPath.Pinnable

/** D1-D4 — CDC / upsert operators.
  *
  * The reference's delta writer turns each record into insert /
  * (equality-delete + insert) / equality-delete
  * (`data/BaseDeltaTaskWriter.write:71-84`) with within-batch key dedup
  * supplied by Iceberg's insert-map (D4). In Spark the whole batch is
  * resolved in one shuffle: a last-wins hash AGGREGATION per key
  * (`max_by` on the offset), then a split into data rows and delete keys.
  *
  * Scale: one hash-partitioned shuffle on the id columns per micro-batch —
  * the minimum possible for keyed upserts — with map-side partial
  * aggregation, so a hot key reduces to one row per upstream partition
  * before it ever crosses the wire (r17 skew sweep).
  */
object CdcOps {

  val OpCol = "__graft_op"
  val OrdCol = "__graft_ord"

  /** D1 — op-code extraction (`data/IcebergWriter.extractCdcOperation:109-131`):
    * first char of the trimmed, uppercased value: U→UPDATE, D→DELETE,
    * anything else / null / empty → INSERT. D3 — upsert mode treats every
    * record as UPDATE (`BaseDeltaTaskWriter.java:74-76`).
    */
  def opColumn(cdcField: Option[String], upsertMode: Boolean): Column =
    if (upsertMode || cdcField.isEmpty) lit(if (upsertMode) "U" else "I")
    else {
      val first = upper(substring(trim(col(cdcField.get).cast("string")), 1, 1))
      when(first === "U", "U").when(first === "D", "D").otherwise("I")
    }

  /** D2 + D4 — resolve a batch to (rows to append, delete keys).
    *
    * `df` must carry [[OpCol]] and an ordering column [[OrdCol]] (Kafka
    * offset when available — the reference processes in offset order).
    * Returns data rows (final op I or U, within-batch last-wins — D4)
    * and delete keys: a key whose batch sequence contains ANY U or D.
    * The reference replays ops sequentially
    * (`data/BaseDeltaTaskWriter.write:71-84`: U = equality-delete +
    * insert, D = equality-delete), so a delete-then-reinsert `[D(k),
    * I(k)]` — or any U/D anywhere in the key's sequence — must still
    * equality-delete the key's rows from EARLIER commits; keying the
    * delete on the FINAL op alone silently kept the prior-commit row
    * alongside the reinsert. Equality deletes apply to strictly earlier
    * sequence numbers (Iceberg v2 rule), so this batch's own data row is
    * never affected.
    */
  def resolveBatch(
      df: DataFrame,
      keyCols: Seq[String]
  ): (DataFrame, DataFrame) = {
    require(keyCols.nonEmpty,
      "CDC/upsert requires id columns (parity: data/Utilities.java:169-178)")
    // Last-wins per key as a HASH AGGREGATION (max_by on the ordering
    // column), not a window: both are one shuffle on the id columns, but
    // the aggregation gets map-side PARTIAL combine, so a hot key (one
    // entity carrying 25% of a batch — the r17 skew sweep's CDC shape)
    // reduces to one partial row per upstream partition before the
    // shuffle, where the window formulation funnels the key's every row
    // through a single sort task. Identical output whenever OrdCol is
    // unique per row (it is: the Kafka offset / event id); tie order on
    // duplicate offsets is unspecified in both formulations, exactly like
    // the reference's arrival-order replay under an offset collision.
    // Materialize the resolved batch once — the data append and the
    // delete-key file derive from it in two separate write jobs.
    // Pinned (default localCheckpoint): resolveBatch runs inside a
    // foreachBatch/commit attempt, so a lost executor costs a batch
    // RETRY fenced by the commit log's batchId guard, never wrong data —
    // see HotPath's scaladoc for the story and the reliable-mode knob.
    val srcCols = df.columns.toSeq
    // NULL offsets sort lowest (the window formulation's DESC NULLS LAST):
    // max_by SKIPS rows whose ordering value is null, so an all-null key
    // would otherwise aggregate to a null struct instead of picking a row
    val ord = coalesce(col(OrdCol), lit(Long.MinValue))
    val last = df
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(struct(srcCols.map(col): _*), ord).as("__graft_last"),
        max(when(col(OpCol) === "U" || col(OpCol) === "D", 1).otherwise(0))
          .as("__graft_del"))
      .select(srcCols.map(c => col(s"__graft_last.`$c`").as(c)) :+ col("__graft_del"): _*)
      .pin()
    val data = last.filter(col(OpCol) =!= "D").drop(OpCol, OrdCol, "__graft_del")
    val deleteKeys = last
      .filter(col("__graft_del") === 1)
      .select(keyCols.map(col): _*)
    (data, deleteKeys)
  }
}
