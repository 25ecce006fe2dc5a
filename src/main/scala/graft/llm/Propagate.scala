package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score propagation over a similarity graph — personalized-PageRank-style
  * power iteration, the graph-quality primitive a curation pipeline uses
  * to BLEED trusted signals through duplicate/similarity edges (a doc
  * near-duplicating many high-quality docs is probably high-quality; a
  * doc clustered with spam is probably spam). Fixed-round:
  *
  *   s_{t+1}(v) = (1−d)·s_0(v) + d · Σ_{u~v} s_t(u) / deg(u)
  *
  * over the UNDIRECTED edge list (both directions materialized once,
  * degrees from that list; isolated nodes keep (1−d)·s_0 — the classic
  * teleport-only fixed point). The edge list is NORMALIZED first:
  * duplicate pair rows are de-duplicated and self-pairs dropped, so the
  * scores are those of the simple undirected graph a caller handing in
  * pair evidence (possibly multi-reported by several detectors) expects
  * — degrees never depend on how many detectors re-found the same pair.
  *
  * Exactness contract (the engine-wide integer-exchange rule): scores
  * live as LONG micros; each edge contribution is rounded to micros
  * BEFORE the neighbor sum (`round(d·s/deg)` per edge), so every
  * aggregation exchanges exact BIGINTs — order-independent across
  * engines and partitionings. The rounding bias is < rounds·deg·0.5 µ —
  * irrelevant for a ranking signal, essential for a verifiable one.
  *
  * Scale shape: per round exactly ONE shuffle pair — an edge⋈score hash
  * join on `src` (the static edge+degree table is checkpointed once and
  * reused every round, partitioned by the join key) and one partial-agg
  * sum by `dst`. Rounds are a small constant (diffusion, not
  * convergence); state per round is one (id, long) row per node, and
  * each round's state is localCheckpoint'ed so the logical plan stays
  * ONE join+agg deep regardless of `rounds` — without it the plan grows
  * per round and planning time, not data, becomes the bottleneck. No
  * driver materialization at any size.
  *
  * Checkpoint-block lifetime: rebinding `s` each round drops the only
  * reference to the previous round's checkpointed RDD, so its blocks are
  * reclaimed by Spark's ContextCleaner on the next GC cycle — the LIVE
  * set is bounded at edges + base + current state + one in-flight round.
  * (An explicit release isn't possible here: `Dataset.unpersist` frees
  * cache-manager entries, not checkpoint blocks, and enumerating
  * `sc.getPersistentRDDs` from inside an operator could unpersist a
  * concurrent caller's state mid-job.)
  */
object Propagate {

  /** [[propagateScoresReport]]'s result: the scores plus what the loop
    * actually did — `rounds` executed and whether a tol run STOPPED on
    * the verified geometric-tail bound (`converged = false` on a tol run
    * means the cap fired first; fixed-round runs are always `false`).
    * Without this a tol caller cannot tell early-stop from cap-hit
    * except by diffing against a second fixed-round run.
    */
  final case class PropagateResult(scores: DataFrame, rounds: Int, converged: Boolean)

  /** @param nodes (id, s0_micros) — seed scores in integer micros
    * @param edges (id_a, id_b) — undirected pair evidence; duplicate pair
    *   rows and self-pairs are normalized away (simple-graph semantics)
    * @param tolMicros optional CONVERGENCE stopping rule: after each
    *   round, stop early once the GEOMETRIC-TAIL bound
    *   `d/(1−d) · Σ|Δs_micros|` is ≤ tol — callers wanting the PageRank
    *   fixed point set a tolerance instead of guessing `rounds` (which
    *   becomes the iteration CAP). The bound is sound because each
    *   round's delta mass is spread L1-preservingly then damped
    *   (`L1(Δ_{r+k}) ≤ d^k·L1(Δ_r)`), so the total remaining change at
    *   ANY node over all further rounds is ≤ `d/(1−d)·L1(Δ_r)` — a true
    *   per-node ≤ tol guarantee against running any number of extra
    *   rounds (up to the documented per-round rounding bias). A bare
    *   `max|Δ| ≤ tol` check has no such guarantee: a hub fed by many
    *   small-delta spokes can still move by ~deg·tol next round. The
    *   check is one extra sum-agg per round over already-checkpointed
    *   state (integer-exact, engine-independent).
    */
  def propagateScores(
      nodes: DataFrame,
      edges: DataFrame,
      damping: Double = 0.85,
      rounds: Int = 3,
      tolMicros: Option[Long] = None
  ): DataFrame =
    propagateScoresReport(nodes, edges, damping, rounds, tolMicros).scores

  /** [[propagateScores]] plus run metadata (rounds executed, converged
    * flag) — same computation, observable stopping behavior.
    */
  def propagateScoresReport(
      nodes: DataFrame,
      edges: DataFrame,
      damping: Double = 0.85,
      rounds: Int = 3,
      tolMicros: Option[Long] = None
  ): PropagateResult = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    require(tolMicros.forall(_ >= 0L), s"tolMicros must be >= 0, got $tolMicros")
    // a null endpoint fails LOUDLY (the nextFitPack/checkedId contract):
    // the src =!= dst filter below evaluates to NULL for such rows and
    // would silently drop them — degrees and inflow computed on a
    // truncated graph with no signal
    val checkedEdges = edges.select(
      when(col("id_a").isNull || col("id_b").isNull,
        raise_error(lit("propagateScores: edge with a null endpoint — fix the pair " +
          "evidence upstream (an outer join?) rather than scoring a truncated graph")))
        .otherwise(col("id_a")).as("id_a"),
      col("id_b").as("id_b"))
    val dir = checkedEdges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(checkedEdges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
    // static across rounds: materialize once, every round joins against it
    val dirDeg = dir.join(deg, "src").localCheckpoint()
    val base = nodes.select(col("id"),
      round(lit(1.0 - damping) * col("s0_micros").cast("double")).cast("long").as("base"))
      .localCheckpoint()
    var s = nodes.select(col("id"), col("s0_micros").cast("long").as("s_micros"))
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      r += 1
      val inflow = dirDeg.join(s.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          round(lit(damping) * col("s_micros").cast("double") / col("deg").cast("double"))
            .cast("long").as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      val next = base.join(inflow, Seq("id"), "left")
        .select(col("id"), (col("base") + coalesce(col("inflow"), lit(0L))).as("s_micros"))
        .localCheckpoint()
      // the check runs on the FINAL round too: the flag it sets is
      // RETURNED (PropagateResult.converged), so skipping it reported
      // converged=false for a run that reached tolerance exactly at the
      // cap — and rounds=1 could never report convergence at all
      tolMicros.foreach { tol =>
        // one sum-agg join over two checkpointed (id, long) states; a
        // node absent from a side (shouldn't happen — both derive from
        // `nodes`) counts as a full-delta change, never a silent skip
        val sumDelta = next.withColumnRenamed("s_micros", "s_new")
          .join(s.withColumnRenamed("s_micros", "s_old"), Seq("id"), "full")
          .select(coalesce( // empty node set → sum is null → converged at 0
            sum(abs(coalesce(col("s_new"), lit(0L)) - coalesce(col("s_old"), lit(0L)))),
            lit(0L)).as("d"))
          .head().getLong(0)
        // stop when the tail bound d/(1−d)·L1(Δ) is ≤ tol (scalar math on
        // the driver; rearranged to avoid dividing near 1−d → 0)
        if (sumDelta.toDouble * damping <= tol.toDouble * (1.0 - damping)) converged = true
      }
      s = next
    }
    PropagateResult(s, r, converged)
  }
}
