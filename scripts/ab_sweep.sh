#!/usr/bin/env bash
# Interleaved cross-TREE bench A/B (r18): run the full Bench surface on
# N git refs, interleaved (t1, t2, ..., tN, t1, ...) so ambient drift
# cancels, then report per-query cross-tree ratios from the RAW canary
# seconds each artifact carries (scripts/ab_report.py) — AmbientRef
# differences between trees cancel because the report renormalizes every
# run from raw canary seconds, not the tree's own baked-in reference.
#
# This is the methodology that settled the r15 bench dispute, promoted
# to a script so a same-round budget regeneration can never again make a
# cross-round regression gate-invisible (r17 VERDICT item 1).
#
# Usage: scripts/ab_sweep.sh <label>=<ref> <label>=<ref> ... [--rounds N]
#   e.g. scripts/ab_sweep.sh r16=8ca21cb r17=1057e0e r18=HEAD --rounds 2
# Output: .work/ab/bench_<label>_<round>.json + the report table.
#
# Each ref gets its own git worktree under .work/ab/tree_<label> (own sbt
# target — safe to run while a repo-root sbt server is idle; do NOT run
# other benches concurrently, the measurements share the machine).
set -euo pipefail
cd "$(dirname "$0")/.."

ROUNDS=2
declare -a LABELS REFS
for arg in "$@"; do
  case "$arg" in
    --rounds) ;; # value handled below
    *=*) LABELS+=("${arg%%=*}"); REFS+=("${arg#*=}") ;;
    [0-9]*) ROUNDS="$arg" ;;
  esac
done
[ "${#LABELS[@]}" -ge 2 ] || { echo "need at least two label=ref args" >&2; exit 1; }

ROOT=$PWD/.work/ab
mkdir -p "$ROOT"

for i in "${!LABELS[@]}"; do
  label="${LABELS[$i]}"; ref="${REFS[$i]}"
  tree="$ROOT/tree_$label"
  # Resolve the ref in the MAIN repo before entering the worktree: inside
  # a stale worktree `HEAD` resolves to the worktree's own old commit (a
  # silently-successful no-op), and a swallowed checkout failure would
  # bench last sweep's code under this sweep's label — the same
  # stale-artifact bug class skew_sweep.sh r18 fixed.
  sha=$(git rev-parse --verify "$ref^{commit}")
  if [ ! -d "$tree" ]; then
    git worktree add --detach "$tree" "$sha"
  else
    git -C "$tree" checkout --detach "$sha"
  fi
  echo "=== compile $label ($(git -C "$tree" rev-parse --short HEAD)) ==="
  (cd "$tree" && sbt -batch compile >/dev/null)
done

run_bench() { # $1 = label, $2 = round
  local tree="$ROOT/tree_$1"
  echo "=== bench $1 round $2 ==="
  local stamp
  stamp=$(mktemp "$ROOT/.stamp.XXXXXX")
  (cd "$tree" && SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
    sbt -batch "runMain graft.Bench" | grep '"metric"')
  if [ ! "$ROOT/tree_$1/BENCH_out.json" -nt "$stamp" ]; then
    echo "FATAL: BENCH_out.json was not rewritten by this run ($1 round $2)" >&2
    rm -f "$stamp"; exit 1
  fi
  rm -f "$stamp"
  mv "$ROOT/tree_$1/BENCH_out.json" "$ROOT/bench_$1_$2.json"
}

for r in $(seq 1 "$ROUNDS"); do
  for label in "${LABELS[@]}"; do
    run_bench "$label" "$r"
  done
done

python3 scripts/ab_report.py "$ROOT" "$ROUNDS" "${LABELS[@]}"
