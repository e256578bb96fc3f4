#!/bin/bash
# Interleaved SINK-BRIDGE close (r17, judge ask #1): one full-suite
# close under BOTH evaluation sinks — the pre-r17 `.count()` sink
# (Catalyst prunes computed columns from pure-projection plans) and the
# r17 noop-write sink (full column evaluation) — with the two variants
# ALTERNATING at shard granularity inside one session, so host-floor
# drift (which moves 10-15% WITHIN a session, BENCH_NOTES r15/r16)
# lands evenly on both sides instead of confounding the bridge.
#
# Usage: tools/run_close_ab.sh <sfDir> <outPrefix> [runs] [shards]
# Writes <outPrefix>_count.json and <outPrefix>_noop.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="$1"; PREFIX="$2"; RUNS="${3:-3}"; SHARDS="${4:-3}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

declare -A parts
parts[count]=""
parts[noop]=""
for i in $(seq 0 $((SHARDS - 1))); do
  for sink in count noop; do
    part="target/close_ab_${sink}_shard_${i}_of_${SHARDS}.json"
    echo "close-ab: sink=$sink shard $i/$SHARDS -> $part" >&2
    SPARK_GRAFT_SF_DIR="$SF_DIR" \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS="$RUNS" \
    SPARK_GRAFT_SHARD="$i/$SHARDS" \
    SPARK_GRAFT_SINK="$sink" \
    SPARK_GRAFT_BENCH_OUT="$part" \
    java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-48g} ${GRAFT_JAVA_OPTS:-} \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench > /dev/null
    parts[$sink]="${parts[$sink]} $part"
  done
done
python3 tools/merge_bench.py "${PREFIX}_count.json" ${parts[count]}
python3 tools/merge_bench.py "${PREFIX}_noop.json" ${parts[noop]}
echo "close-ab: wrote ${PREFIX}_count.json and ${PREFIX}_noop.json" >&2
