#!/bin/bash
# Host-floor CANARY (r15 methodology, VERDICT r14 ask #2): a pinned
# 10-query set of queries untouched since r10, run FIRST in every bench
# or judge session on an idle box. Round-over-round wall-clock ratios
# are normalized by this set's movement — the r14 judge reproduced a
# persistent ~1.4x host-floor shift on an idle box, so raw cross-round
# ratios are confounded without it.
#
# Usage: tools/run_canary.sh <sfDir> <outJson> [runs]
# Reference draws: BENCH_CANARY_* in the repo root + the BENCH_NOTES
# canary table.
set -euo pipefail
cd "$(dirname "$0")/.."

CANARY_MEMBERS=q_jaccard_pairs,q_dedup_clusters,q_ann_pq,q_minhash_lsh,q_pmi_pairs,q_lm_score,q_pagerank,q_topk_per_group,q_kmv_ndv,q_label_prop

SERVE_MEMBERS_OVERRIDE="$CANARY_MEMBERS" \
  exec tools/run_serve_bench.sh "$1" "$2" "${3:-3}"
