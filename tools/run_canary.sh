#!/bin/bash
# Host-floor CANARY (r15 methodology + r17 shape-aware extension): a
# pinned 10-query set untouched since r10, run FIRST in every bench or
# judge session on an idle box, PLUS:
#   - a DRAM-bandwidth probe (graft.HostProbe, no Spark): shuffle-heavy
#     members are bandwidth-bound, and r16 measured a session where the
#     narrow-CPU canary IMPROVED while shuffle/media members read +40%
#     — a single narrow-CPU number provably does not transfer across
#     member shapes, so the floor needs a per-shape reading;
#   - a 3-member SHAPE set, one per cost shape: q_lm_score (narrow CPU,
#     already in the canary set), q_minhash_lsh (shuffle/bandwidth),
#     q_image_phash (media decode).
# Round-over-round wall-clock ratios are normalized per shape: compare
# a shuffle member against the shuffle probe's movement, not the CPU
# canary's.
#
# Usage: tools/run_canary.sh <sfDir> <outJson> [runs]
# Writes: <outJson>               (pinned 10-query canary, unchanged)
#         <outJson%.json>_floor.json  (bandwidth probe line)
#         <outJson%.json>_shapes.json (3-member shape set)
# Reference draws: BENCH_CANARY_* in the repo root + the BENCH_NOTES
# canary table.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="$1"; OUT="$2"; RUNS="${3:-3}"

CANARY_MEMBERS=q_jaccard_pairs,q_dedup_clusters,q_ann_pq,q_minhash_lsh,q_pmi_pairs,q_lm_score,q_pagerank,q_topk_per_group,q_kmv_ndv,q_label_prop
SHAPE_MEMBERS=q_lm_score,q_minhash_lsh,q_image_phash

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

BASE="${OUT%.json}"

# 1. bandwidth floor (runs first: zero JVM/Spark warm-state dependence)
SPARK_GRAFT_PROBE_OUT="${BASE}_floor.json" \
java $ADD_OPENS -Xmx4g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.HostProbe >&2

# 2. the pinned canary set (format/output unchanged since r15)
SERVE_MEMBERS_OVERRIDE="$CANARY_MEMBERS" \
  tools/run_serve_bench.sh "$SF_DIR" "$OUT" "$RUNS"

# 3. the per-shape probe set, its own fresh JVM
SERVE_MEMBERS_OVERRIDE="$SHAPE_MEMBERS" \
  tools/run_serve_bench.sh "$SF_DIR" "${BASE}_shapes.json" "$RUNS"
