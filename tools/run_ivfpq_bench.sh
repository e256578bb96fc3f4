#!/bin/bash
# IVF-PQ build+probe preset (r16, judge ask #8: the override recipe
# behind BENCH_IVFPQ_r15_*, promoted to a one-command runner): the
# build-path member (trains + encodes + probes, rebuilt fresh every
# JVM) and its probe-only serving twin. Same protocol as
# run_serve_bench.sh.
#
# Usage: tools/run_ivfpq_bench.sh <sfDir> <outJson> [runs]
set -euo pipefail
cd "$(dirname "$0")/.."

IVFPQ_MEMBERS=q_ann_ivfpq,q_ann_ivfpq_probe

SERVE_MEMBERS_OVERRIDE="$IVFPQ_MEMBERS" \
  exec tools/run_serve_bench.sh "$1" "$2" "${3:-3}"
