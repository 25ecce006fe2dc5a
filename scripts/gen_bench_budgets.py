#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchBudgets.scala from two (or more)
quiet-machine Bench runs: per query, budget = min over runs of
(seconds / run ambient ratio).  Usage:
    gen_bench_budgets.py BENCH_out_run1.json BENCH_out_run2.json ...
"""
import json, sys

# file-only trend entries (build/probe and train/score splits) are not in
# SparkEntry.queries, so the gate can never check them — keep them out of
# the table so it states exactly what the gate covers
SPLIT_KEYS = {
    "dedup_embedding_incremental_build", "dedup_embedding_incremental_probe",
    "quality_lm2_train", "quality_lm2_score",
}

def ambient_at(samples, pos):
    """Piecewise-linear ambient ratio at a query position (Bench.ambientAt)."""
    if pos <= samples[0][0]:
        return samples[0][1]
    if pos >= samples[-1][0]:
        return samples[-1][1]
    for (x0, y0), (x1, y1) in zip(samples, samples[1:]):
        if x0 <= pos <= x1:
            return y0 if x1 == x0 else y0 + (y1 - y0) * (pos - x0) / (x1 - x0)
    return samples[-1][1]

budget = {}
for path in sys.argv[1:]:
    d = json.load(open(path))
    a = d["ambient"]["ratio"]
    # r17: mid-run ambient samples — normalize each query by the
    # interpolated ratio at its position, exactly as Bench.norm does
    samples = d["ambient"].get("samples")
    qnames = sorted(k for k in d["queries"] if k not in SPLIT_KEYS)
    pos = {k: i + 0.5 for i, k in enumerate(qnames)}
    for k, v in d["queries"].items():
        if v is None or k in SPLIT_KEYS:
            continue
        n = v / (ambient_at(samples, pos[k]) if samples else a)
        if k not in budget or n < budget[k]:
            budget[k] = n

body = "\n".join(f'    "{k}" -> {budget[k]:.3f},' for k in sorted(budget))
src = f'''package graft

/** Per-query wall-time budgets for [[Bench]]'s regression gate, in
  * AMBIENT-NORMALIZED seconds (measured seconds divided by the run's
  * ambient canary ratio — see Bench's canary). Regenerate from two quiet
  * Bench runs with scripts/gen_bench_budgets.py.
  *
  * The gate flags a query when its normalized time exceeds
  * budget x Bench.GateTolerance + Bench.GateFloorSec, re-measures it,
  * and reports CONFIRMED vs TRANSIENT — so a regression is caught in
  * the round that introduces it instead of by the next round's judge.
  */
object BenchBudgets {{
  val normalizedSeconds: Map[String, Double] = Map(
{body}
  )
}}
'''
open("src/main/scala/graft/BenchBudgets.scala", "w").write(src)
print(f"wrote {len(budget)} budgets")
