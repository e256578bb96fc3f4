#!/bin/bash
# Full-suite CLOSE split across K fresh JVMs (r16 methodology, judge
# ask #2): the single-JVM 194x3 close carries a late-JVM GC tax —
# q_corpus_report_mm measured 34.9 s in-suite vs 11.2 s fresh-JVM at
# r15 — so the close runs as K round-robin shards of the sorted
# registry, one fresh JVM each, merged by tools/merge_bench.py.
# Shard membership is computed by graft.Bench itself
# (SPARK_GRAFT_SHARD=i/k), so the split never rots as the registry
# grows. Keep ONE single-JVM draw per round for the audit trail
# (tools/run_serve_bench.sh with no override runs the serve preset;
# a bare graft.Bench run is the legacy single-JVM close).
#
# Usage: tools/run_close.sh <sfDir> <outJson> [runs] [shards]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="$1"; OUT="$2"; RUNS="${3:-3}"; SHARDS="${4:-3}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# NO JIT overrides here: the ADC flags (see run_serve_bench.sh,
# SPARK_GRAFT_JIT=adc) measured +25% on the normal member mix — the
# full close keeps stock JIT behavior; the bimodal-kernel caveat only
# bites the three full-ADC members at sf10 (BENCH_NOTES r16)
JIT_OPTS=""

parts=()
for i in $(seq 0 $((SHARDS - 1))); do
  part="target/close_shard_${i}_of_${SHARDS}.json"
  echo "close: shard $i/$SHARDS -> $part" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_RUNS="$RUNS" \
  SPARK_GRAFT_SHARD="$i/$SHARDS" \
  SPARK_GRAFT_BENCH_OUT="$part" \
  java $ADD_OPENS $JIT_OPTS -Xmx${SPARK_DRIVER_MEM:-48g} ${GRAFT_JAVA_OPTS:-} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > /dev/null
  parts+=("$part")
done
python3 tools/merge_bench.py "$OUT" "${parts[@]}"
