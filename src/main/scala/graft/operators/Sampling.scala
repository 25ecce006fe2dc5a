package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand()`-based sampling is neither reproducible across runs nor
  * expressible as an oracle; this sampler hashes a stable key with a
  * Lehmer-style congruential map over the Mersenne prime 2^31-1 and keeps
  * rows whose bucket falls below `rate`. Every step fits in 64-bit
  * arithmetic with no overflow ((p-1)·a + b < 2^62), so the EXACT same
  * formula runs in any SQL engine — reproducible splits are what make
  * training mixes auditable.
  *
  * Pure codegen'd column math: map-side at scan speed, no shuffle, and
  * the filter can sit directly above the parquet scan.
  */
object Sampling {

  /** 2^31-1, the Lehmer modulus. */
  val P: Long = (1L << 31) - 1

  /** Classic LCG multiplier/increment (glibc constants) — quality is fine
    * for bucketing, and small constants keep the arithmetic overflow-free
    * and portable.
    */
  val A: Long = 1103515245L
  val B: Long = 12345L

  /** Bucket in [0, P): `((key mod P) * A + B) mod P`, seed-shifted.
    * The key must be numeric (or a numeric string): a null or
    * non-castable key FAILS the job — `cast` would null it, `null <
    * threshold` filters to null, and the "sample" silently returns zero
    * rows with no signal.
    */
  def hashBucket(key: Column, seed: Long = 0L): Column = {
    val k = key.cast("long")
    val checked = when(k.isNull,
      raise_error(concat(lit("sampling key is null or non-numeric: '"),
        coalesce(key.cast("string"), lit("null")), lit("'")))).otherwise(k)
    // the seed folds in AFTER the key's own mod: `key + seed` could
    // overflow 64-bit for hash-derived keys near Long.MaxValue (silent
    // wrap non-ANSI, ArithmeticException under ANSI) — the sum below
    // stays < 2^32, preserving the no-overflow portability contract.
    // seed = 0 (the default every driver query uses) is bit-identical to
    // the pre-normalized form.
    val seedNorm = ((seed % P) + P) % P
    pmod(pmod(pmod(checked, lit(P)) + lit(seedNorm), lit(P)) * lit(A) + lit(B), lit(P))
  }

  /** Keep ~`rate` of rows, deterministically by `key`. */
  /** Rates must be real probabilities: a negative or NaN rate (a sign
    * bug or bad division upstream) would otherwise return a silently
    * EMPTY "sample" — the no-signal failure mode the null-key
    * raise_error in [[hashBucket]] exists to prevent.
    */
  private def requireRate(rate: Double, op: String): Unit =
    require(!rate.isNaN && rate >= 0.0 && rate <= 1.0,
      s"$op: rate must be in [0, 1], got $rate")

  def hashSample(df: DataFrame, keyCol: String, rate: Double, seed: Long = 0L): DataFrame = {
    requireRate(rate, "hashSample")
    df.filter(hashBucket(col(keyCol), seed) < lit((rate * P).toLong))
  }

  /** Deterministic dataset split — the train/val/test partition every
    * training pipeline starts with: each row's [[hashBucket]] falls into
    * one of the share bands, so membership is a pure function of the key
    * (reproducible across runs, engines, and re-shards; adding data
    * never moves an existing row between splits). Shares must sum to
    * ≤ 1; any remainder goes to the LAST split, so `Seq(0.8, 0.1, 0.1)`
    * wastes nothing to rounding. Appends `split` with the given names.
    * Pure map-side column arithmetic — no shuffle, no RNG.
    */
  def splitByHash(
      df: DataFrame,
      keyCol: String,
      shares: Seq[(String, Double)],
      seed: Long = 0L
  ): DataFrame = {
    require(shares.nonEmpty && shares.forall(_._2 > 0),
      s"split shares must be positive: $shares")
    require(shares.map(_._2).sum <= 1.0 + 1e-9,
      s"split shares sum to ${shares.map(_._2).sum} > 1: $shares")
    requireFreshColumn(df, "split", "splitByHash")
    val bucket = hashBucket(col(keyCol), seed)
    // integer band edges: cumulative share × P, truncated — the same
    // fixed-point rule hashSample applies, so split("train", r) keeps
    // exactly the rows hashSample(r) would
    val edges = shares.scanLeft(0.0) { case (acc, (_, s)) => acc + s }
      .tail.map(c => (c * P).toLong)
    val expr = shares.init.zip(edges.init).foldRight(
      lit(shares.last._1): Column) { case (((name, _), hi), acc) =>
      when(bucket < hi, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic weighted interleave (training-mix epoch composition):
    * row r of stratum s lands at position `(r-1) / w_s`, so reading the
    * output ordered by position yields each stratum at a rate ∝ its
    * weight, reproducibly — the merge order a mix spec compiles to,
    * without RNG. One window shuffle (rank within stratum); the position
    * math is codegen'd column arithmetic, portable to any SQL engine.
    */
  def interleaveByWeight(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0,
      s"interleave weights must be positive (zero would put a stratum at NaN/Inf positions): " +
        s"$weights default=$defaultWeight")
    requireFreshColumn(df, "mix_pos", "interleaveByWeight")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(keyCol))
    val weightExpr = weights.foldLeft(lit(defaultWeight)) { case (acc, (value, wt)) =>
      when(col(strataCol) === value, lit(wt)).otherwise(acc)
    }
    df.withColumn("mix_pos",
      (row_number().over(w) - 1).cast("double") / weightExpr)
  }

  /** Quality-weighted variant: per-ROW keep probability from a column
    * (e.g. a quality score — the "sample good documents more" step of a
    * curation mix). `prob` is clamped to [0, 1]; NULL and NaN
    * probabilities drop the row (an unscorable doc is not silently kept
    * — Spark's ordering would otherwise clamp NaN to 1.0 and keep every
    * corrupt-scored row with certainty). Same portable congruential
    * bucket, so the exact selection reproduces in any SQL engine; still
    * a pure map-side filter.
    */
  def weightedHashSample(
      df: DataFrame,
      keyCol: String,
      prob: Column,
      seed: Long = 0L
  ): DataFrame = {
    val p = prob.cast("double")
    val clamped = when(isnan(p), lit(0.0))
      .otherwise(least(greatest(p, lit(0.0)), lit(1.0)))
    // floor() the per-row threshold so engine/oracle agree on boundaries
    df.filter(hashBucket(col(keyCol), seed) < floor(clamped * lit(P.toDouble)).cast("long"))
  }

  /** Loud output-column collision check for operators that emit a fixed
    * derived column (`rk`, `cum_cost`): the check matches the analyzer's
    * resolution — case-insensitive under the default
    * `spark.sql.caseSensitive=false` (where withColumn would silently
    * REPLACE the caller's same-named column), exact under case-sensitive
    * sessions (where withColumn ADDS a distinct column beside it).
    */
  private[operators] def requireFreshColumn(df: DataFrame, name: String, op: String): Unit = {
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val collides =
      if (caseSensitive) df.columns.contains(name)
      else df.columns.exists(_.equalsIgnoreCase(name))
    require(!collides,
      s"input already has a '$name' column — $op emits '$name' and would overwrite it")
  }

  /** Keep the best `k` rows of each group under `ordering` (e.g. top-k
    * documents per source by quality score) — the "select the best
    * documents per domain" curation step. Pass a fully deterministic
    * ordering (break score ties on the row key) or the survivors are
    * partition-order dependent.
    *
    * 100 TB shape: the rank-filter pattern triggers Spark's
    * WindowGroupLimit optimization — each input partition is pre-pruned
    * to ≤ k rows per group BEFORE the window shuffle, so the exchange
    * carries k×partitions candidates per group, not the whole corpus
    * (asserted on the physical plan in the test suite).
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      ordering: Seq[Column],
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    requireFreshColumn(df, "rk", "topKPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(ordering: _*)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Token-budget capping per stratum (the "cap each domain at N tokens"
    * step of a training-mix spec): orders each stratum's rows by the
    * portable congruential hash (then by key, so the order is total and
    * reproducible) and keeps rows while the running `cost` total stays
    * within `budget`. Deterministic, oracle-portable, and
    * prefix-monotone: re-running on a grown corpus keeps a prefix of the
    * same hash order, so the selection is stable under appends that hash
    * later. Emits the running total as `cum_cost`.
    *
    * 100 TB shape: one window shuffle partitioned by stratum. A running
    * sum cannot use the rank-filter group-limit prune (every row's
    * predecessor set matters), so a single giant domain serializes into
    * one task — pre-splitting such a domain into hash sub-strata and
    * budgeting each at budget/k is the documented escape hatch.
    */
  def budgetSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      cost: Column,
      budget: Long,
      seed: Long = 0L
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    requireFreshColumn(df, "cum_cost", "budgetSample")
    // cost contract enforced loudly (the hashBucket null-key discipline):
    // a NULL cost would ride along free (window sum skips NULLs), a
    // negative cost breaks the prefix property (later rows could re-enter
    // under the budget), a NaN cost poisons the running sum — NaN is
    // neither null nor < 0, the sum goes NaN from that row on, and the
    // non-ANSI long cast turns NaN into 0 so EVERY later row passes the
    // budget filter — and a FRACTIONAL cost breaks oracle portability
    // (Spark's double→long cast truncates, DuckDB's rounds, so the two
    // engines would select different boundary rows AND Spark could
    // overspend the true budget). Token/char costs are integral; enforce
    // it so the running total is exact 64-bit arithmetic in any engine.
    val costD = cost.cast("double")
    val checkedCost = when(
      cost.isNull || (cost.isNotNull && costD.isNull) || // non-castable: every other
        // arm below is NULL for it and when(NULL) would fall through to a
        // NULL long — the row would ride along FREE (window sum skips it)
        costD < 0 || isnan(costD) || costD =!= floor(costD) ||
        costD > lit(Long.MaxValue.toDouble), // Infinity/overflow-sized
      raise_error(concat(lit("budgetSample cost is null, negative, NaN or non-integral: '"),
        coalesce(cost.cast("string"), lit("null")), lit("'")))).otherwise(cost.cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucket(col(keyCol), seed), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_cost", sum(checkedCost).over(w))
      .filter(col("cum_cost") <= budget)
  }

  /** Target-mix rebalancing (the DoReMi-style "compile a domain-weight
    * spec into keep rates" step): given target SHARES per stratum
    * (used as-is — pass them normalized; they are deliberately not
    * re-normalized here, because a floating sum's value depends on
    * iteration order and the selection must reproduce bit-exactly in
    * any SQL engine), computes the largest without-replacement
    * subcorpus whose expected mix matches the target: the scarcest
    * stratum relative to its share binds the output size
    * `t = min_s(count_s / share_s)`, and each stratum keeps
    * `t * share_s / count_s` of its rows deterministically by the
    * portable congruential hash. Strata absent from `targets` are
    * dropped; a target stratum absent from the corpus fails loudly
    * (the requested mix is infeasible, not approximately achievable).
    *
    * 100 TB shape: one count aggregation whose result is
    * stratum-cardinality-sized (a driver map, like the dynamic router's
    * distinct values), then a pure map-side hash filter — no shuffle
    * touches the corpus itself.
    */
  def rebalanceToTargetMix(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      targets: Map[String, Double],
      seed: Long = 0L
  ): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"target shares must be positive: $targets")
    // stratum cardinality = small (domains/languages); driver-sized map
    val counts = df.groupBy(col(strataCol).cast("string").as("s"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targets.keys.filterNot(s => counts.getOrElse(s, 0L) > 0L)
    require(missing.isEmpty,
      s"target strata absent from the corpus (mix infeasible): ${missing.mkString(", ")}")
    val t = targets.map { case (s, share) => counts(s) / share }.min
    // a BINDING stratum (cnt/share == t) keeps rate exactly 1.0 — the
    // round trip fl(fl(t * share) / cnt) can land just below 1.0 and
    // silently drop a row whose hash bucket is P-1; pinning the binding
    // stratum makes "the scarcest stratum is kept whole" exact (the
    // oracle mirrors this with the same double-equality CASE)
    val rates = targets.map { case (s, share) =>
      s -> (if (counts(s) / share == t) 1.0 else t * share / counts(s))
    }
    stratifiedHashSample(df, keyCol, strataCol, rates, defaultRate = 0.0, seed)
  }

  /** Stratified variant: per-stratum rates (e.g. per source/language
    * domain weights in a training mix), `defaultRate` elsewhere. The rate
    * lookup is a codegen'd CASE over the (small) strata map.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      seed: Long = 0L
  ): DataFrame = {
    requireRate(defaultRate, "stratifiedHashSample")
    rates.foreach { case (v, r) => requireRate(r, s"stratifiedHashSample($v)") }
    val cap = rates.foldLeft(lit((defaultRate * P).toLong)) { case (acc, (value, rate)) =>
      when(col(strataCol) === value, lit((rate * P).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), seed) < cap)
  }
}
