#!/bin/bash
# CROSS-HEAD interleaved full-suite close A/B (r18, judge ask #1): the
# measurement r17 didn't run. Two git refs (e.g. r16 HEAD vs r17 HEAD)
# are materialized into their own worktrees, compiled once each, and
# the FULL sorted-registry close runs on both sides with the two
# checkouts ALTERNATING AT SHARD GRANULARITY inside one session
# (shard 0: A,B; shard 1: B,A; ... — balanced ABBA, so linear host-
# floor drift cancels in the pairwise differences). Both sides run
# SPARK_GRAFT_SINK=count (pre-r17 checkouts have no noop sink, and the
# sink must be identical for the comparison to mean anything — the
# r17 sink bridge maps count onto noop separately).
#
# This either proves a close-total inflation is host floor (expected:
# per-member B/A ~ 1.0 for code-untouched members) or finds the code
# regression a narrow-CPU canary cannot see.
#
# Usage: tools/run_xhead_close.sh <refA> <refB> <sfDir> <outPrefix> \
#          [draws=2] [runs=3] [shards=3]
#   writes <outPrefix>_{A,B}_draw<N>.json (merged over shards) and
#   <outPrefix>_report.json (per-member median-of-draws per side,
#   B/A ratio, members >1.3 listed under "outliers").
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$(pwd)"

REF_A="$1"; REF_B="$2"; SF_DIR="$3"; PREFIX="$4"
DRAWS="${5:-2}"; RUNS="${6:-3}"; SHARDS="${7:-3}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

setup_side() { # $1 = side name (A|B), $2 = ref -> echoes classes dir
  local side="$1" ref="$2"
  local wt="$REPO/target/ab_wt_${side}"
  if [ ! -d "$wt" ]; then
    git worktree add --detach "$wt" "$ref" >&2
  else
    git -C "$wt" checkout --detach "$ref" >&2
  fi
  (cd "$wt" && sbt -batch compile > /dev/null 2>&1) \
    || { echo "xhead: compile failed for $side=$ref" >&2; exit 1; }
  echo "$wt/target/scala-2.13/classes"
}

echo "xhead: compiling side A ($REF_A)" >&2
CLASSES_A="$(setup_side A "$REF_A")"
echo "xhead: compiling side B ($REF_B)" >&2
CLASSES_B="$(setup_side B "$REF_B")"

shard_run() { # $1 = side, $2 = classes, $3 = draw, $4 = shard
  local part="target/xhead_$1_draw$3_shard$4.json"
  echo "xhead: draw $3 shard $4/$SHARDS side $1 -> $part" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_RUNS="$RUNS" \
  SPARK_GRAFT_SHARD="$4/$SHARDS" \
  SPARK_GRAFT_SINK=count \
  SPARK_GRAFT_BENCH_OUT="$part" \
  java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-48g} ${GRAFT_JAVA_OPTS:-} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$2:/opt/spark/jars/*" \
    graft.Bench > /dev/null
}

for d in $(seq 1 "$DRAWS"); do
  parts_A=""; parts_B=""
  for i in $(seq 0 $((SHARDS - 1))); do
    # shard-granularity ABBA: even shards A-first, odd shards B-first
    if [ $(( i % 2 )) -eq 0 ]; then
      shard_run A "$CLASSES_A" "$d" "$i"; shard_run B "$CLASSES_B" "$d" "$i"
    else
      shard_run B "$CLASSES_B" "$d" "$i"; shard_run A "$CLASSES_A" "$d" "$i"
    fi
    parts_A="$parts_A target/xhead_A_draw${d}_shard${i}.json"
    parts_B="$parts_B target/xhead_B_draw${d}_shard${i}.json"
  done
  python3 tools/merge_bench.py "${PREFIX}_A_draw${d}.json" $parts_A
  python3 tools/merge_bench.py "${PREFIX}_B_draw${d}.json" $parts_B
  # report after EVERY draw: a truncated session still leaves a valid
  # (fewer-draw) artifact of record
  python3 - "$PREFIX" "$d" "$REF_A" "$REF_B" <<'EOF'
import json, sys, statistics
prefix, draws, ref_a, ref_b = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
sides = {}
for side in ("A", "B"):
    per = {}
    for d in range(1, draws + 1):
        q = json.load(open(f"{prefix}_{side}_draw{d}.json"))["queries"]
        for k, v in q.items():
            per.setdefault(k, []).append(v)
    sides[side] = {k: statistics.median(v) for k, v in per.items()}
members, only = {}, {"A": [], "B": []}
for k in sorted(set(sides["A"]) | set(sides["B"])):
    a, b = sides["A"].get(k), sides["B"].get(k)
    if a is None: only["B"].append(k); continue
    if b is None: only["A"].append(k); continue
    members[k] = {"A_median": round(a, 3), "B_median": round(b, 3),
                  "B_over_A": round(b / a, 3)}
shared_a = sum(m["A_median"] for m in members.values())
shared_b = sum(m["B_median"] for m in members.values())
report = {
    "refs": {"A": ref_a, "B": ref_b}, "sink": "count", "draws": draws,
    "shared_total_A": round(shared_a, 1), "shared_total_B": round(shared_b, 1),
    "shared_total_B_over_A": round(shared_b / shared_a, 3),
    "outliers_over_1.3": {k: m for k, m in members.items()
                          if m["B_over_A"] > 1.3},
    "only_in_one_side": only,
    "members": members,
}
out = f"{prefix}_report.json"
json.dump(report, open(out, "w"), indent=1)
print(json.dumps({k: v for k, v in report.items() if k != "members"},
                 indent=1))
print(f"xhead: report -> {out}", file=sys.stderr)
EOF
done
