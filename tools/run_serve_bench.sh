#!/bin/bash
# Serve-tier bench runner (r11 methodology: median of 3, one JVM per
# sf, serve/compose/probe members only). Usage:
#   tools/run_serve_bench.sh <sfDir> <outJson> [runs]
# Runs graft.Bench directly on the compiled classes (no sbt lock) with
# the JDK17 add-opens Spark 4 needs outside spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="$1"; OUT="$2"; RUNS="${3:-3}"

SERVE_MEMBERS=${SERVE_MEMBERS_OVERRIDE:-q_ann_ivf_probe,q_ann_ivfpq_probe,q_ann_opq,q_ann_opq_np,q_ann_pq_probe,q_corpus_filter_mm_compose,q_corpus_filter_staged_compose,q_corpus_report_compose,q_corpus_report_mm_compose,q_cross_source_dups_compose,q_data_card_published,q_forget_clusters,q_forget_verdict,q_hard_negatives_compose,q_image_jpeg_clusters,q_publish_verdict,q_semdedup_compose,q_split_leakage_safe_compose}

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# GRAFT_JAVA_OPTS: optional extra JVM flags (GC logging, OOM handlers)
# for instrumented draws — empty by default so recorded numbers are not
# perturbed unless a run asks for it.
#
# SPARK_GRAFT_JIT=adc (r16, OPT-IN -- OBSOLETE since the native-ADC
# commit): the interpreted aggregate() islands that bloated the ADC
# kernels past HotSpot's huge-method/recompilation cutoffs (the
# measured 2.5 s vs 10-30 s bimodal flips) were replaced by small
# native codegen loops, and three fresh stock-JIT sf10 draws show
# zero flips with warm probes ~3x FASTER than the old fast mode
# (BENCH_NOTES r16 "native codegen expressions"). The flags remain
# only to reproduce the r16 mid-round draws; do not use them for new
# numbers -- they measured +25% on a normal member mix.
JIT_OPTS=""
if [ "${SPARK_GRAFT_JIT:-}" = "adc" ]; then
  JIT_OPTS="-XX:-DontCompileHugeMethods -XX:PerMethodRecompilationCutoff=-1 -XX:PerBytecodeRecompilationCutoff=-1"
fi
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_RUNS="$RUNS" \
SPARK_GRAFT_ONLY="$SERVE_MEMBERS" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
java $ADD_OPENS $JIT_OPTS -Xmx${SPARK_DRIVER_MEM:-48g} ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
