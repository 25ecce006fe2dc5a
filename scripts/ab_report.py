#!/usr/bin/env python3
"""Cross-tree bench A/B report (r18): per-query normalized ratios between
git trees from scripts/ab_sweep.sh output.

Usage: ab_report.py <dir> <rounds> <label1> <label2> [label3 ...]

Normalization is from RAW canary seconds (ratio * the run's own ref), so
trees with different AmbientRef constants compare in the same units: a
query's normalized time is seconds / (raw_canary_at_position / REF),
with one common REF for every run (the first run's ref — it cancels in
cross-tree ratios anyway). Per query, each tree contributes its
MIN-of-rounds normalized time; ratios are tree_k / tree_1.
"""
import json
import sys

# file-only trend entries (build/probe and train/score splits): not part
# of the main timed sweep, so they must not shift the POSITIONS the
# ambient samples are interpolated at (Bench samples at main-sweep query
# indices only; gen_bench_budgets.py excludes the same keys)
SPLIT_KEYS = {
    "dedup_embedding_incremental_build", "dedup_embedding_incremental_probe",
    "quality_lm2_train", "quality_lm2_score",
}


def ambient_at(samples, pos):
    if pos <= samples[0][0]:
        return samples[0][1]
    if pos >= samples[-1][0]:
        return samples[-1][1]
    for (x0, y0), (x1, y1) in zip(samples, samples[1:]):
        if x0 <= pos <= x1:
            return y0 if x1 == x0 else y0 + (y1 - y0) * (pos - x0) / (x1 - x0)
    return samples[-1][1]


def load(path, common_ref):
    d = json.load(open(path))
    ref = d["ambient"]["ref"]
    queries = {k: v for k, v in d["queries"].items()
               if v is not None and k not in SPLIT_KEYS}
    # raw canary seconds at each sample position, renormalized to the
    # common reference so trees with different refs share units; trees
    # predating mid-run samples (r16 and older) fall back to start/end
    if "samples" in d["ambient"]:
        samples = [(p, (r * ref) / common_ref) for p, r in d["ambient"]["samples"]]
    else:
        samples = [(0.0, d["ambient"]["start"] / common_ref),
                   (float(len(queries)), d["ambient"]["end"] / common_ref)]
    qnames = sorted(queries)
    pos = {k: i + 0.5 for i, k in enumerate(qnames)}
    return {k: v / ambient_at(samples, pos[k]) for k, v in queries.items()}


def main():
    root, rounds = sys.argv[1], int(sys.argv[2])
    labels = sys.argv[3:]
    common_ref = json.load(open(f"{root}/bench_{labels[0]}_1.json"))["ambient"]["ref"]
    norm = {}  # label -> {query -> min normalized}
    for label in labels:
        per_q = {}
        for r in range(1, rounds + 1):
            for k, v in load(f"{root}/bench_{label}_{r}.json", common_ref).items():
                if k not in per_q or v < per_q[k]:
                    per_q[k] = v
        norm[label] = per_q
    base = labels[0]
    qs = sorted(set.intersection(*(set(norm[l]) for l in labels)))
    header = "| query | " + " | ".join(f"{l} (s)" for l in labels) + \
        " | " + " | ".join(f"{l}/{base}" for l in labels[1:]) + " |"
    sep = "|" + "---|" * (1 + len(labels) + len(labels) - 1)
    rows = []
    for q in qs:
        vals = [norm[l][q] for l in labels]
        ratios = [v / vals[0] if vals[0] > 0 else float("inf") for v in vals[1:]]
        rows.append((max(ratios), q, vals, ratios))
    rows.sort(key=lambda r: -r[0])
    print(header)
    print(sep)
    for _, q, vals, ratios in rows:
        print(f"| {q} | " + " | ".join(f"{v:.3f}" for v in vals) +
              " | " + " | ".join(f"{r:.2f}" for r in ratios) + " |")
    totals = [sum(norm[l][q] for q in qs) for l in labels]
    print()
    print("TOTALS (normalized, min-of-rounds, common queries only):")
    for l, t in zip(labels, totals):
        extra = f"  ({t / totals[0]:.3f}x {base})" if l != base else ""
        print(f"  {l}: {t:.1f} s{extra}")
    for l, per_q in norm.items():
        only = set(per_q) - set(qs)
        if only:
            print(f"  note: {l} has {len(only)} queries not in every tree: {sorted(only)}")


if __name__ == "__main__":
    main()
