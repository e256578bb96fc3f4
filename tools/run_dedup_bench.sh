#!/bin/bash
# DEDUP-tier preset (r16, judge ask #8: the SERVE_MEMBERS_OVERRIDE
# recipe used for BENCH_DEDUP_r14/r15, promoted to a one-command
# runner): the six dedup members whose scale curve the round verdicts
# track. Same protocol as run_serve_bench.sh (median of RUNS, one
# fresh JVM per sf).
#
# Usage: tools/run_dedup_bench.sh <sfDir> <outJson> [runs]
set -euo pipefail
cd "$(dirname "$0")/.."

DEDUP_MEMBERS=q_dedup_exact,q_embed_near_dup_incremental,q_embed_near_dup_selective,q_incremental_dedup,q_minhash_lsh,q_simhash_pairs

SERVE_MEMBERS_OVERRIDE="$DEDUP_MEMBERS" \
  exec tools/run_serve_bench.sh "$1" "$2" "${3:-3}"
