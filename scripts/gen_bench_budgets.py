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

budget = {}
for path in sys.argv[1:]:
    d = json.load(open(path))
    a = d["ambient"]["ratio"]
    for k, v in d["queries"].items():
        if v is None or k in SPLIT_KEYS:
            continue
        n = v / a
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
