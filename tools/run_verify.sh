#!/bin/bash
# Local pre-flight for the driver's correctness gate: runs graft.Verify
# on the compiled classes, then the DuckDB oracle compare.
# Usage: tools/run_verify.sh <sfDir> <outDir> [onlyCsv]
set -uo pipefail
cd "$(dirname "$0")/.."
SF_DIR="$1"; OUT="$2"; ONLY="${3:-}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

rm -rf "$OUT"
SPARK_GRAFT_CPUS=32 \
java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-48g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT" $ONLY || exit 1
python3 tools/check_oracle.py "$SF_DIR" "$OUT"
