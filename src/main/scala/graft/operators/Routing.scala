package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.config.{EngineConfig, TableConfig}

/** R1-R3, R6-R7 — record routing as Catalyst filter operators.
  *
  * The reference routes record-by-record on the worker
  * (`channel/Worker.java:103-144`); here each route becomes a declarative
  * filter over the (persisted) micro-batch, so Catalyst pushes the
  * predicate into the scan and each table's write reads only its slice.
  */
object Routing {

  /** Resolved routing result: per-table slices of the batch. For dynamic
    * routing the table list is discovered from the batch itself.
    */
  def route(df: DataFrame, config: EngineConfig): Seq[(TableConfig, DataFrame)] =
    config.routeField match {
      // R1 — no route field: broadcast every record to all tables
      // (`Worker.java:103-113`)
      case None =>
        config.resolvedTables.map(t => t -> df)

      case Some(field) if !config.dynamicRouting =>
        // R2 — static regex routing (`Worker.java:115-133`); the reference
        // uses Matcher.matches() = full match, hence the ^(?:...)$ wrap.
        // R7 — null route values are dropped (`Worker.java:116-117`).
        config.resolvedTables.flatMap { t =>
          t.routeRegex.map { re =>
            t -> df.filter(col(field).isNotNull && col(field).rlike(s"^(?:$re)$$"))
          }
        }

      case Some(field) =>
        // R3 — dynamic: table name = lowercased route value
        // (`Worker.java:135-144`). Distinct route values are collected on
        // the driver — cardinality is the number of target tables (small
        // by construction), not the batch size.
        val names = df
          .filter(col(field).isNotNull)
          .select(lower(col(field).cast("string")).as("t"))
          .distinct()
          .collect()
          .map(_.getString(0))
          .toSeq
          .sorted
        // A route VALUE becomes a warehouse-relative path (dots = catalog
        // separators), so it is data-driven filesystem input: a value like
        // "../../tmp/x" or one with a slash would create a table OUTSIDE
        // the warehouse. The reference rejects unparseable identifiers via
        // TableIdentifier.parse; same contract here — fail the batch loudly.
        names.foreach { n =>
          // validate the WHOLE string, not split segments: Java's
          // split('.') strips trailing empties, so "..", "a.", "." would
          // pass a forall over segments vacuously and derive malformed
          // warehouse paths (e.g. the warehouse root itself)
          require(n.matches("[a-z0-9_-]+(\\.[a-z0-9_-]+)*"),
            s"dynamic route value '$n' is not a valid table identifier " +
              "(dot-separated [a-z0-9_-] segments) — refusing to derive a " +
              "filesystem path from it")
        }
        names.map { n =>
          config.tableConfig(n) -> df.filter(lower(col(field).cast("string")) === n)
        }
    }

  /** Dead-letter split (Kafka Connect `errors.tolerance=all` +
    * dead-letter-queue analogue — in the reference deployment this is
    * the Connect framework's job, so a Spark user needs it from the
    * engine): one pass over the batch yields the valid slice and the
    * dead slice, the latter annotated with a `_dlq` struct (reason +
    * rejection timestamp). Both outputs are filters over the SAME scan —
    * no shuffle, no second read; route the dead slice to its own table
    * and the batch never fails on a poison record.
    */
  def deadLetterSplit(
      df: DataFrame,
      valid: org.apache.spark.sql.Column,
      reason: org.apache.spark.sql.Column
  ): (DataFrame, DataFrame) = {
    val ok = df.filter(valid)
    val dead = df.filter(!coalesce(valid, lit(false)))
      .withColumn("_dlq", struct(reason.as("reason"), current_timestamp().as("rejected_at")))
    (ok, dead)
  }

  /** R6 — tombstone filter: kafka-shaped records (topic/partition/offset
    * columns present) whose value column is null are skipped
    * (`data/IcebergWriter.java:66-76` ignores null-value records).
    * Callers compute offset bookkeeping on the UNFILTERED batch — the
    * reference's worker tracks offsets for every consumed record,
    * tombstones included.
    */
  def dropTombstones(df: DataFrame, valueColumn: String = "value"): DataFrame = {
    val cols = df.columns.toSet
    if (Set("topic", "partition", "offset", valueColumn).subsetOf(cols))
      df.filter(col(valueColumn).isNotNull)
    else df
  }
}
