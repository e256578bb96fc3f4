#!/bin/bash
# Contraction-gate A/B on ONE HEAD (r18, judge ask #3): side G = the
# shipped gate (SPARK_GRAFT_CONTRACT unset, ContractionStats decides),
# side C = forced always-contract (SPARK_GRAFT_CONTRACT=always). Both
# sides run the same compiled classes, interleaved G C C G per draw
# block so linear session-floor drift cancels — the r17 artifact's two
# flaws (unlabeled sides, cross-commit confound) are gone by
# construction: the side is IN the filename and the HEAD is shared.
#
# Usage: tools/run_contract_ab.sh <sfDir> <outPrefix> [draws=2] [runs=3] \
#          [members=q_dedup_clusters,q_embed_clusters,q_embed_clusters_staged]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="$1"; PREFIX="$2"; DRAWS="${3:-2}"; RUNS="${4:-3}"
MEMBERS="${5:-q_dedup_clusters,q_embed_clusters,q_embed_clusters_staged}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

draw() { # $1 = side (gate|always), $2 = draw index
  local side="$1" i="$2" env_extra=()
  [ "$side" = "always" ] && env_extra=(SPARK_GRAFT_CONTRACT=always)
  echo "=== draw $i side $side ($SF_DIR)" >&2
  env "${env_extra[@]}" \
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS="$RUNS" SPARK_GRAFT_ONLY="$MEMBERS" \
    SPARK_GRAFT_BENCH_OUT="${PREFIX}_${side}_draw${i}.json" \
    java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-48g} \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench > /dev/null
}

for ((i = 1; i <= DRAWS; i++)); do
  # balanced block: G C C G per pair of draw indices
  if (( i % 2 == 1 )); then draw gate "$i"; draw always "$i"
  else draw always "$i"; draw gate "$i"; fi
done

python3 - "$PREFIX" <<'EOF'
import glob, json, statistics, sys
prefix = sys.argv[1]
sides = {}
for side in ("gate", "always"):
    per = {}
    for f in sorted(glob.glob(f"{prefix}_{side}_draw*.json")):
        for q, v in json.load(open(f))["queries"].items():
            per.setdefault(q, []).append(v)
    sides[side] = {q: statistics.median(v) for q, v in per.items()}
report = {"prefix": prefix, "sides": sides,
          "ratio_gate_over_always": {
              q: round(sides["gate"][q] / sides["always"][q], 3)
              for q in sides.get("gate", {}) if q in sides.get("always", {})}}
out = f"{prefix}_report.json"
json.dump(report, open(out, "w"), indent=1)
print(json.dumps(report["ratio_gate_over_always"], indent=1))
print("wrote", out)
EOF
