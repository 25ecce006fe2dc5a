#!/usr/bin/env bash
# Adversarial skew sweep (r17): run the FULL Bench query surface on two
# matched-volume fixture arms — uniform vs skewed (zipf route field, hot
# CDC key, ≥10k-member near-dup group, hot shingle, 100×-length docs,
# hot partition day, 10%-identical + degenerate embeddings; see
# graft.tools.SkewProbe) — INTERLEAVED (u, s, u, s) so ambient drift
# cancels, then report the per-query skewed/uniform normalized ratio
# (min-of-2 per arm, each normalized by its run's per-position ambient).
#
# Usage: scripts/skew_sweep.sh [rounds]   (default 2)
# Output: .work/skew/bench_{uniform,skewed}_N.json + the report table
# from scripts/skew_report.py (paste into SCALE.md).
#
# Do NOT run sbt (tests or benches) concurrently — shared target dir.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUNDS="${1:-2}"
ROOT=$PWD/.work/skew
# pairs-listing queries under the giant dup group carry a Θ(m²)-pair
# OUTPUT (tens of millions of rows) — size the JVM for their shuffles
# the way sf1_verify.sh does, so the sweep measures the plan, not spill
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-32g}"
sbt -batch compile
sbt -batch "runMain graft.tools.SkewProbe /root/testdata/sf0.1 $ROOT"

run_bench() { # $1 = arm (uniform|skewed), $2 = round index
  echo "=== bench $1 round $2 ==="
  # A failed Bench must fail the sweep — the old `|| true` swallowed sbt
  # errors, letting the mv promote a STALE BENCH_out.json from an earlier
  # run into this round's slot and silently corrupt the skewed/uniform
  # comparison. With pipefail, a failing sbt OR a metric-less run (grep
  # no-match — equally broken) now aborts under set -e; the stamp check
  # below additionally proves BENCH_out.json was rewritten BY THIS run.
  local stamp
  stamp=$(mktemp "$ROOT/.stamp.XXXXXX")
  SPARK_GRAFT_SF_DIR="$ROOT/$1" sbt -batch "runMain graft.Bench" \
    | grep '"metric"'
  if [ ! BENCH_out.json -nt "$stamp" ]; then
    echo "FATAL: BENCH_out.json was not rewritten by this run ($1 round $2)" >&2
    rm -f "$stamp"; exit 1
  fi
  rm -f "$stamp"
  mv BENCH_out.json "$ROOT/bench_$1_$2.json"
}

for i in $(seq 1 "$ROUNDS"); do
  run_bench uniform "$i"
  run_bench skewed "$i"
done

python3 scripts/skew_report.py "$ROOT" "$ROUNDS"
