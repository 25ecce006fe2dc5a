#!/usr/bin/env bash
# One-command sf1 correctness gate (see TESTDATA.md "Locally generated
# sf1"): materialize the 10x-sf0.1 dataset if absent, run graft.Verify's
# full 129-query dump against it, then compare — 126 queries exactly
# against their DuckDB oracles, pack_sequences by the complete next-fit
# invariant set, and the two embedding-LSH queries against their designed
# sub-1% recall bound (scripts/check_sf1.py documents all three).
#
# Takes ~15-30 min. Run it after any operator change that could be
# scale-sensitive (caps, thresholds, iteration bounds — see SCALE.md
# "CAPS"). Do NOT run `sbt test` concurrently: Verify and the test suite
# share .work/<query> fixture directories.
#
# An interactive sbt session holds the project build lock — exit it first
# or this script waits on the lock.
set -euo pipefail
cd "$(dirname "$0")/.."

# Sf1Probe --generate-only materializes into .work/sf1 (skipped when its
# _DONE marker exists) — the two paths below are therefore fixed.
SF1=$PWD/.work/sf1
OUT=$PWD/.work/verify_sf1

rm -rf "$OUT"
sbt "runMain graft.tools.Sf1Probe --generate-only" \
    "runMain graft.Verify $SF1 $OUT"
python3 scripts/check_sf1.py "$SF1" "$OUT"
