#!/usr/bin/env python3
"""Merge the interleaved skew-sweep Bench runs into the per-query
skewed/uniform ratio table for SCALE.md.

Per arm, each query's time is min over rounds of (seconds / the run's
interpolated ambient ratio at that query's position) — the same
normalization Bench's gate uses. Ratio = skewed / uniform. Queries that
FAILED (null) in any skewed run are listed first: an OOM/crash under
skew is the worst finding, not a missing row.

Usage: skew_report.py <root> <rounds>   (reads <root>/bench_<arm>_<i>.json)
"""
import json
import sys

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


def load_arm(root, arm, rounds):
    best, failed = {}, set()
    for i in range(1, rounds + 1):
        d = json.load(open(f"{root}/bench_{arm}_{i}.json"))
        samples = d["ambient"].get("samples") or [[0, d["ambient"]["ratio"]]]
        qnames = sorted(k for k in d["queries"] if k not in SPLIT_KEYS)
        pos = {k: j + 0.5 for j, k in enumerate(qnames)}
        for k, v in d["queries"].items():
            if k in SPLIT_KEYS:
                continue
            if v is None:
                failed.add(k)
                continue
            n = v / ambient_at(samples, pos[k])
            if k not in best or n < best[k]:
                best[k] = n
    return best, failed


def main():
    root = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    uni, uni_failed = load_arm(root, "uniform", rounds)
    skw, skw_failed = load_arm(root, "skewed", rounds)
    if skw_failed:
        print("## QUERIES THAT FAILED UNDER SKEW (worst finding — fix first)")
        for q in sorted(skw_failed):
            print(f"  FAIL {q}")
    if uni_failed:
        print("## queries that failed on the uniform arm (fixture bug?)")
        for q in sorted(uni_failed):
            print(f"  FAIL {q}")
    rows = []
    for q in sorted(set(uni) & set(skw)):
        u, s = uni[q], skw[q]
        # a floor keeps sub-50ms fixtures from producing junk ratios
        ratio = s / max(u, 0.05)
        rows.append((ratio, q, u, s))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > 3.0 and r[3] > 0.25]
    print(f"\n{len(rows)} queries compared; {len(over)} over the 3x skew gate "
          f"(and >0.25s skewed)\n")
    print("| query | uniform s | skewed s | ratio |")
    print("|---|---|---|---|")
    for ratio, q, u, s in rows[:25]:
        flag = " **>3x**" if (ratio > 3.0 and s > 0.25) else ""
        print(f"| {q}{flag} | {u:.3f} | {s:.3f} | {ratio:.2f} |")
    tot_u = sum(u for _, _, u, _ in rows)
    tot_s = sum(s for _, _, _, s in rows)
    print(f"\ntotals: uniform {tot_u:.1f}s, skewed {tot_s:.1f}s, "
          f"ratio {tot_s / tot_u:.2f}")
    json.dump(
        {q: {"uniform": round(u, 3), "skewed": round(s, 3), "ratio": round(r, 3)}
         for r, q, u, s in rows},
        open(f"{root}/skew_report.json", "w"), indent=1)
    print(f"wrote {root}/skew_report.json")


if __name__ == "__main__":
    main()
