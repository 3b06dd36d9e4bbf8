#!/usr/bin/env python3
"""Per-key scaling exponents between two Bench sweeps at different
scale factors (round-11 sf1.0 rehearsal).

Usage: python3 tools/exponents.py <bench_lo.json> <bench_hi.json> [factor=10]

exponent = log(t_hi / t_lo) / log(factor); 1.0 = linear, 2.0 =
quadratic, <1 = fixed-cost amortizing. Keys dominated by Spark's
fixed DAG/codegen floor (~0.3-0.7 s) show exponents near 0 — that is
the floor amortizing, not sub-linear compute. Prints a Markdown table
sorted by exponent (worst first) plus aggregate stats.
"""
import json
import math
import sys


def main():
    lo = json.loads(open(sys.argv[1]).read())
    hi = json.loads(open(sys.argv[2]).read())
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qlo, qhi = lo["queries"], hi["queries"]
    keys = sorted(set(qlo) & set(qhi))
    rows = []
    for k in keys:
        tl, th = qlo[k], qhi[k]
        if tl <= 0 or th <= 0:
            continue
        exp = math.log(th / tl) / math.log(factor)
        rows.append((exp, k, tl, th))
    rows.sort(reverse=True)
    print(f"| key | t@lo (s) | t@hi (s) | ratio | exponent |")
    print(f"|---|---|---|---|---|")
    for exp, k, tl, th in rows:
        print(f"| {k} | {tl:.2f} | {th:.2f} | {th/tl:.1f}x | {exp:.2f} |")
    exps = [r[0] for r in rows]
    exps_sorted = sorted(exps)
    med = exps_sorted[len(exps_sorted) // 2]
    print()
    print(f"n={len(rows)} median_exponent={med:.2f} "
          f"max={max(exps):.2f} "
          f"total_lo={sum(r[2] for r in rows):.1f}s "
          f"total_hi={sum(r[3] for r in rows):.1f}s "
          f"over_linear={sum(1 for e in exps if e > 1.15)}")


if __name__ == "__main__":
    main()
