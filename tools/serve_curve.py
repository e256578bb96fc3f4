#!/usr/bin/env python3
"""Emit the serving-tier scale-curve markdown table from three
BENCH_SERVE samples (sf0.1, sf1, sf10). Dev-tool only."""
import json
import math
import sys


def main(p01: str, p1: str, p10: str) -> None:
    a, b, c = (json.load(open(p)) for p in (p01, p1, p10))
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    # SERVE_MEMBERS_OVERRIDE subsets (e.g. the ivffix reruns) make the
    # three member sets differ; intersect rather than KeyError, and say
    # what was dropped so a partial table can't read as a full tier
    shared = sorted(set(qa) & set(qb) & set(qc))
    dropped = sorted((set(qa) | set(qb) | set(qc)) - set(shared))
    if dropped:
        print(f"WARNING: dropped (not in all three samples): "
              f"{', '.join(dropped)}", file=sys.stderr)
    if not shared:
        # zero shared members (wrong files, disjoint OVERRIDE subsets)
        # must not exit 0 with an empty table — a vacuous success reads
        # as a valid empty curve
        print("ERROR: the three samples share no member; no curve to "
              "emit", file=sys.stderr)
        sys.exit(1)
    rows = []
    for q in shared:
        if min(qa[q], qb[q], qc[q]) <= 0:
            print(f"WARNING: non-positive timing for {q}; skipped",
                  file=sys.stderr)
            continue
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
    # totals over the SHARED members only — the headline "value" fields
    # are not comparable when the member sets differ
    ta = sum(qa[q] for q in shared)
    tb = sum(qb[q] for q in shared)
    tc = sum(qc[q] for q in shared)
    if min(ta, tb, tc) > 0:
        print(f"\nshared-member totals: {ta:.1f} s -> {tb:.1f} s -> "
              f"{tc:.1f} s; tier exp d1 {math.log10(tb/ta):.2f}, "
              f"d2 {math.log10(tc/tb):.2f}, "
              f"two-decade {math.log10(tc/ta)/2:.2f}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
