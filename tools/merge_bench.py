#!/usr/bin/env python3
"""Merge k shard bench JSONs (SPARK_GRAFT_SHARD runs) into one close
artifact: per-query maps union (shards are disjoint by construction),
total = sum of medians, provenance recorded under "shards". Dev-tool.

Usage: merge_bench.py <out.json> <shard0.json> <shard1.json> ...
"""
import json
import sys


def main(out: str, *parts: str) -> None:
    if len(parts) < 2:
        sys.exit("ERROR: need at least 2 shard files to merge")
    shards = [json.load(open(p)) for p in parts]
    merged = {"metric": "total", "value": 0.0, "unit": "sec"}
    maps = ("queries", "spread", "samples", "cpu", "rows", "errors",
            "failed_runs")
    for m in maps:
        merged[m] = {}
    seen = set()
    for s in shards:
        dup = seen & set(s["queries"])
        if dup:
            sys.exit(f"ERROR: shards overlap on {sorted(dup)[:5]} — "
                     "not a disjoint shard set")
        seen |= set(s["queries"])
        for m in maps:
            merged[m].update(s.get(m, {}))
    merged["value"] = sum(merged["queries"].values())
    runs = {s.get("runs") for s in shards}
    sfs = {s.get("sf") for s in shards}
    if len(runs) != 1 or len(sfs) != 1:
        sys.exit(f"ERROR: shards disagree on runs={runs} or sf={sfs}")
    merged["runs"] = runs.pop()
    merged["sf"] = sfs.pop()
    merged["shards"] = len(shards)
    # keep queries sorted for round-over-round diffing
    for m in maps:
        merged[m] = dict(sorted(merged[m].items()))
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    n_err = len(merged["errors"])
    print(f"merged {len(shards)} shards -> {out}: "
          f"{merged['value']:.1f} s / {len(merged['queries'])} queries / "
          f"{n_err} errors")


if __name__ == "__main__":
    main(*sys.argv[1:])
