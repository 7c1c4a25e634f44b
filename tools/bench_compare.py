#!/usr/bin/env python3
"""Load-normalized bench regression gate.

Compares two BENCH_FULL.json files (old, new). Each carries a
`calib_s` field — a fixed deterministic CPU+shuffle micro-task timed
on the same machine right before the query loop — so per-query times
divide by it to cancel run-to-run machine drift (round 14 measured a
uniform 1.43x inflation with zero plan changes).

A query flags as a REGRESSION when its calib-normalized ratio exceeds
the threshold AND its absolute delta exceeds the noise floor (tiny
queries flap on scheduler jitter).

usage: bench_compare.py OLD.json NEW.json [ratio=1.5] [floor_s=0.5]
exit 1 if any regression flagged.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio_gate = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    co, cn = old.get("calib_s"), new.get("calib_s")
    if co and cn:
        drift = cn / co
        print(f"calib_s: {co:.3f} -> {cn:.3f} (machine drift x{drift:.2f})")
    else:
        drift = 1.0
        print("calib_s missing in one side; comparing raw times")
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    print(f"{len(common)} common queries "
          f"(+{len(set(qn) - set(qo))} new, -{len(set(qo) - set(qn))} gone)")
    bad = []
    for q in common:
        o, n = qo[q], qn[q]
        norm_ratio = (n / drift) / o if o > 0 else float("inf")
        if norm_ratio > ratio_gate and (n / drift) - o > floor_s:
            bad.append((norm_ratio, q, o, n))
    for r, q, o, n in sorted(bad, reverse=True):
        print(f"REGRESSION {q}: {o:.2f}s -> {n:.2f}s "
              f"(x{r:.2f} after drift normalization)")
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    print(f"common-surface total: {tot_o:.1f}s -> {tot_n:.1f}s raw, "
          f"{tot_n / drift:.1f}s drift-normalized")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
