#!/bin/bash
# Targeted pre-flight: verify only the named queries, then filter the
# oracle map to those with outputs before the DuckDB compare.
# -e: a failed filter step (typo'd query name) must stop the run —
# without it check_oracle compared the UNFILTERED map and reported 167
# vacuous failures (r16)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="$1"; OUT="$2"; ONLY="$3"

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
  graft.Verify "$SF_DIR" "$OUT" "$ONLY" || exit 1
python3 - "$OUT" "$ONLY" <<'PY'
import json, os, sys
out, only = sys.argv[1], sys.argv[2]
o = json.load(open(f"{out}/oracle_sql.json"))
keep = {k: v for k, v in o.items() if os.path.isdir(f"{out}/{k}")}
# a typo'd/unregistered name in ONLY must FAIL the pre-flight, not let
# check_oracle pass vacuously over an empty (or silently smaller) map
missing = [q for q in only.split(",") if q and not os.path.isdir(f"{out}/{q}")]
if missing:
    sys.exit(f"ERROR: no verify output for: {', '.join(missing)} "
             "(typo'd or unregistered query name?)")
if not keep:
    sys.exit("ERROR: filtered oracle map is empty — nothing to check")
json.dump(keep, open(f"{out}/oracle_sql.json", "w"))
print(f"filtered oracle map: {len(o)} -> {len(keep)}")
PY
python3 tools/check_oracle.py "$SF_DIR" "$OUT"
