package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-token-budget
  * sequences (the step that turns a curated corpus into the contiguous
  * examples an LM trainer consumes). Next-fit discipline: docs are taken
  * in id order; a doc that does not fit the open sequence closes it and
  * opens the next (a doc larger than the whole budget gets a sequence of
  * its own). Deterministic: (shard, id) totally orders the input.
  *
  * 100 TB shape: packing is inherently sequential, so the corpus is
  * sharded (`shard = id % numShards`) and each shard packs independently —
  * the classic "parallel between shards, sequential within" decomposition.
  * The plan is one hash repartition on the shard key + a sort within
  * partitions + a single streaming pass (typed `mapPartitions` holding
  * O(1) state per shard, never materializing a shard in memory). At
  * cluster scale numShards is sized to executor count; resulting sequence
  * ids are (shard, seq_no) pairs, globally unique without coordination.
  */
object Packing {

  /** Pack `df` rows into sequences of at most `budgetTokens` tokens.
    * Returns (id, shard, seq_no, seq_pos): sequence index within the
    * shard and the doc's position within its sequence.
    */
  def nextFitPack(
      df: DataFrame,
      idCol: String,
      tokensCol: org.apache.spark.sql.Column,
      numShards: Int,
      budgetTokens: Long
  ): DataFrame = {
    require(numShards > 0 && budgetTokens > 0)
    val spark = df.sparkSession
    import spark.implicits._
    // hash-partitioned on shard, so a task owns whole shards; the scan
    // below resets its running state at every shard boundary.
    // Null contract: an id that is null (or fails the long cast) FAILS
    // the job loudly — silently dropping rows from a packing pass is
    // training-data loss with no signal. A null token count (e.g. null
    // text) packs as 0 tokens: the doc keeps its slot, consumes no
    // budget. (Either null would otherwise NPE in the primitive-tuple
    // encoder below.)
    val checkedId = IntegralId.checkedCol(idCol, "nextFitPack")
    // negative token counts fail loudly too: packed into a sequence they
    // DECREASE `used`, so later docs keep "fitting" and the emitted
    // sequence's true token total silently exceeds budgetTokens — a
    // context-window overflow downstream with no signal here
    // only a genuinely NULL count packs as 0: a NON-null value that
    // fails the long cast (a corrupt '12k' string, a wrong column) must
    // fail loudly — coalescing it to 0 would let the doc pack as free
    // and the emitted sequence silently exceed budgetTokens, the exact
    // overflow the negative-count guard below exists to prevent
    val tokCast = tokensCol.cast("long")
    val tokLong = when(tokensCol.isNotNull && tokCast.isNull,
      raise_error(concat(lit("nextFitPack: non-numeric token count '"),
        tokensCol.cast("string"), lit("'")))).otherwise(coalesce(tokCast, lit(0L)))
    val checkedToks = when(tokLong < 0L,
      raise_error(concat(lit(s"nextFitPack: negative token count '"),
        tokLong.cast("string"), lit(s"' — counts must be >= 0")))).otherwise(tokLong)
    val prepared = df
      .select(
        checkedId.as("id"),
        pmod(checkedId, lit(numShards.toLong)).as("shard"),
        checkedToks.as("toks"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Long)]
    prepared.mapPartitions { it =>
      var curShard = Long.MinValue
      var seqNo = -1L
      var seqPos = 0L
      var used = Long.MaxValue
      it.map { case (id, shard, toks) =>
        if (shard != curShard) { curShard = shard; seqNo = -1L; used = Long.MaxValue }
        // the explicit seqNo < 0 arm (not just the Long.MaxValue used
        // sentinel) opens a shard's first sequence even when
        // budgetTokens == Long.MaxValue and the first doc has 0 tokens —
        // the arithmetic alone would emit seq_no = -1 there
        if (seqNo < 0 || used > budgetTokens - toks) { seqNo += 1; seqPos = 0L; used = toks }
        else { seqPos += 1; used += toks }
        (id, shard, seqNo, seqPos)
      }
    }.toDF("id", "shard", "seq_no", "seq_pos")
  }
}
