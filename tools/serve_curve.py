#!/usr/bin/env python3
"""Emit the serving-tier scale-curve markdown table from three
BENCH_SERVE samples (sf0.1, sf1, sf10). Dev-tool only."""
import json
import math
import sys


def main(p01: str, p1: str, p10: str) -> None:
    a, b, c = (json.load(open(p)) for p in (p01, p1, p10))
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    rows = []
    for q in sorted(qa):
        r1, r2 = qb[q] / qa[q], qc[q] / qb[q]
        e1, e2 = math.log10(r1), math.log10(r2)
        e2d = math.log10(qc[q] / qa[q]) / 2
        rows.append((e2d, q, qa[q], qb[q], qc[q], e1, e2))
    rows.sort()
    print("| query | sf0.1 | sf1 | sf10 | exp d1 | exp d2 | exp 2-decade |")
    print("|---|---|---|---|---|---|---|")
    for e2d, q, t01, t1, t10, e1, e2 in rows:
        print(f"| {q} | {t01:.2f} s | {t1:.2f} s | {t10:.2f} s "
              f"| {e1:.2f} | {e2:.2f} | {e2d:.2f} |")
    ta, tb, tc = a["value"], b["value"], c["value"]
    print(f"\ntier totals: {ta:.1f} s -> {tb:.1f} s -> {tc:.1f} s; "
          f"tier exp d1 {math.log10(tb/ta):.2f}, d2 {math.log10(tc/tb):.2f}, "
          f"two-decade {math.log10(tc/ta)/2:.2f}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
