package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query wall
  * times.
  *
  * Round-over-round comparability rules:
  *  - queries run in SORTED NAME ORDER (a Map's hash order would shuffle
  *    the adjacency between rounds, and adjacency matters — a heavy
  *    query's garbage taxes whoever runs next);
  *  - a System.gc() fence runs between queries so one query's heap
  *    pressure (e.g. the dedup suite's shuffle buffers) is not billed to
  *    its neighbor;
  *  - each query runs SPARK_GRAFT_RUNS times (default 3) back-to-back
  *    and reports the MEDIAN, with per-query max−min under "spread" —
  *    single-run numbers carry ±10–15 % JVM noise (BENCH_NOTES.md r2/r3
  *    post-mortems) and round-over-round deltas should not chase it;
  *  - failures are RECORDED, not swallowed: a failed query reports its
  *    exception class+message under "errors"; the MEDIAN covers the
  *    SUCCESSFUL samples only (an intermittent fast-fail must not
  *    report a misleadingly low median), falling back to the fail-time
  *    median when every run failed so a broken query still shows a
  *    number next to its error;
  *  - SPARK_GRAFT_ONLY=q_a,q_b restricts the run (local iteration aid);
  *  - the big JSON line also carries, per query: "samples" (per-sample
  *    wall seconds in run order), "cpu" (per-sample process-CPU
  *    seconds) and "rows" (result count) — the self-diagnosing triple
  *    the r6 driver-vs-builder band blowout demanded (BENCH_NOTES r7/r8
  *    post-mortem): contention shows wall≫cpu, a clock anomaly breaks
  *    the cpu/wall ≤ ncores invariant, and rows proves the work
  *    actually ran;
  *  - the full JSON line is ALSO written to `target/bench.json`
  *    (override: SPARK_GRAFT_BENCH_OUT) — stdout tail capture truncated
  *    the per-query map out of BENCH_r07.json entirely, so the file,
  *    not stdout, is the artifact of record;
  *  - the evaluation SINK is a noop-format write (r17, judge ask #1):
  *    the old `.count()` sink let Catalyst prune every computed column
  *    from pure-projection plans (no agg/join/window/Generate), so
  *    those members benched a parquet row-count scan, not their work —
  *    q_lang_id "cost" 0.4 s at sf10 while the real scoring pass was
  *    1.9 s (BENCH_NOTES r16). `df.write.format("noop")` evaluates
  *    every column of every row and discards them executor-side. The
  *    rows figure now comes from an `observe(count(1))` node on the
  *    same run — zero-column, so it prunes nothing and re-runs
  *    nothing. SPARK_GRAFT_SINK=count restores the old sink for
  *    bridge A/Bs against pre-r17 artifacts; never compare a count-
  *    sink total against a noop-sink total (BENCH_NOTES r17 bridge
  *    table maps one onto the other).
  */
object Bench {
  private def jsonEsc(s: String): String = Json.esc(s)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/broadcast/parquet-reader bootstrap
    // otherwise lands on whichever query runs first (~5s of fixed cost).
    locally {
      import org.apache.spark.sql.functions._
      val r = Tables(spark, sfDir, "region")
      r.join(broadcast(Tables(spark, sfDir, "nation")),
        col("r_regionkey") === col("n_regionkey")).count()
      spark.range(100).select(hash(col("id"))).count()
      // window function + HOF + shuffle aggregate on a 25-row frame:
      // the r8 post-mortem traced the first-sample storms to cold
      // whole-stage codegen of exactly these operator classes (the
      // compiler itself JITs on the first big generated class) —
      // warming them here instead of inside whichever heavy query runs
      // first keeps medians comparable when the query mix shifts
      val n = Tables(spark, sfDir, "nation")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
      n.select(col("n_regionkey"), col("n_nationkey"),
          transform(sequence(lit(1), lit(4)), i => i * col("n_nationkey")).as("arr"))
        .withColumn("s", aggregate(col("arr"), lit(0L), (a, x) => a + x))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("n_regionkey"))
        .agg(sum(col("s")).as("t"), max(col("rn")).as("m"))
        .count()
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_SHARD="i/k": run the i-th of k round-robin shards of
    // the sorted registry (r16, judge ask #2) — the full-suite close
    // splits across k FRESH JVMs so a late-JVM GC tax (old-gen garbage
    // accumulated over ~190 members × 3 samples) stops inflating
    // whoever runs last. Round-robin over the SORTED list keeps each
    // shard's mix representative; self-maintaining as the registry
    // grows (no hard-coded member lists to rot).
    val shard = sys.env.get("SPARK_GRAFT_SHARD").map { s =>
      val Array(i, k) = s.split("/").map(_.trim.toInt)
      require(k > 0 && i >= 0 && i < k, s"bad SPARK_GRAFT_SHARD '$s'")
      (i, k)
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    // build the registry ONCE: SparkEntry.queries is a def, and calling
    // it inside the timed window would bill Map construction + closure
    // allocation (and its garbage) to every sample of every query
    val registry = SparkEntry.queries
    val allNames = registry.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val names = shard match {
      case Some((i, k)) =>
        allNames.zipWithIndex.collect { case (n, j) if j % k == i => n }
      case None => allNames
    }
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val spreads = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val failedRuns = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Per-sample wall times IN RUN ORDER (not sorted): the r6 post-mortems
    // needed to distinguish "first sample pays JIT/page-cache warm-up"
    // from "all samples slow" and the median+spread alone can't — a
    // (20, 3, 3) and a (3, 13, 20) query report identical medians but
    // mean opposite things for regression detection.
    val sampleLog =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // Per-sample PROCESS CPU seconds and last-sample row counts: the r6
    // driver bench swung ±13x against two controlled boxes WITH ZERO
    // code or plan change, in both directions — numbers that wall time
    // alone cannot explain or even attribute. cpu/wall separates
    // external contention (wall up, cpu flat) from a clock/VM anomaly
    // (cpu/wall above the core count, or cpu missing work) — and the
    // row count proves the query did the work its plan says (a
    // 0.44s wall for a query whose plan needs ~180 core-seconds is
    // only possible if the work didn't happen).
    val cpuLog =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val rowsLog = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    // r17: noop-write sink by default (full column evaluation, nothing
    // kept); "count" restores the pre-r17 pruned sink for bridge A/Bs
    val sinkMode = sys.env.getOrElse("SPARK_GRAFT_SINK", "noop")
    require(sinkMode == "noop" || sinkMode == "count",
      s"SPARK_GRAFT_SINK must be noop|count, got '$sinkMode'")
    // rows from the observe() node: the listener fires asynchronously
    // after save() returns, so poll briefly; −1 = metric never arrived
    // (diagnosable, never hangs the bench)
    def observedRows(obs: org.apache.spark.sql.Observation): Long =
      try {
        val row = scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(10, "s"))
        row.getAs[Long]("rows")
      } catch { case _: java.util.concurrent.TimeoutException => -1L }
    names.foreach { name =>
      var sampleIdx = 0
      val samples = (1 to runs).map { _ =>
        System.gc() // fence: don't bill the previous query's garbage here
        val c0 = osBean.map(_.getProcessCpuTime).getOrElse(0L)
        val t0 = System.nanoTime()
        val ok =
          try {
            val df = registry(name)(spark, sfDir)
            if (sinkMode == "count") rowsLog(name) = df.count()
            else {
              sampleIdx += 1
              val obs = org.apache.spark.sql.Observation(
                s"graft_bench_${name}_$sampleIdx")
              df.observe(obs, org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)).as("rows"))
                .write.format("noop").mode("overwrite").save()
              rowsLog(name) = observedRows(obs)
            }
            true
          }
          catch {
            case e: Throwable =>
              errors(name) = s"${e.getClass.getName}: " +
                Option(e.getMessage).getOrElse("").take(300)
              false
          }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = osBean.map(b => (b.getProcessCpuTime - c0) / 1e9).getOrElse(-1.0)
        (wall, cpu, ok)
      }
      sampleLog(name) = samples.map(_._1)
      cpuLog(name) = samples.map(_._2)
      // median over SUCCESSFUL samples only: an intermittent failure's
      // fast-fail wall time must not report a misleadingly low median
      // (the errors + failed_runs maps still flag it). A query that
      // failed EVERY run keeps its fail-time median so a broken query
      // can never masquerade as absent.
      val good = samples.collect { case (t, _, true) => t }.sorted
      val use = if (good.nonEmpty) good else samples.map(_._1).sorted
      times(name) = use(use.size / 2) // median (upper on even n)
      spreads(name) = use.last - use.head
      if (good.size < samples.size)
        failedRuns(name) = (samples.size - good.size).toDouble
    }
    def obj(m: scala.collection.Map[String, Double]) =
      m.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // Round to ms: full-precision doubles triple the line length for
    // noise digits, and the driver's capture already truncates long lines.
    // Locale.ROOT: the f-interpolator formats under the JVM default
    // locale, and a comma-decimal locale (de_DE …) would emit "1,234"
    // inside the arrays — unparseable JSON in all three artifacts
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def sampleObj(m: scala.collection.Map[String, Seq[Double]]) =
      m.map { case (k, vs) =>
        s"\"$k\":[${vs.map(ms).mkString(",")}]"
      }.mkString("{", ",", "}")
    val samplesJson = sampleObj(sampleLog)
    val cpuJson = sampleObj(cpuLog)
    val rowsJson = rowsLog.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"$k\":\"${jsonEsc(v)}\"" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    // Summary line on BOTH sides of the big per-query line: the driver's
    // capture has truncated the HEAD (BENCH_r05 — kept only the tail) and
    // the TAIL (BENCH_r04) of the output in different rounds. Printing the
    // summary before AND after guarantees the headline total and the
    // expensive-query ranking survive either truncation direction.
    val top5 = times.toSeq.sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val sfJson = Json.str(sfDir)
    val summary = s"""{"metric":"summary","value":$total,"unit":"sec","n_queries":${times.size},"n_errors":${errors.size},"top5":$top5,"sf":$sfJson}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(times)},"spread":${obj(spreads)},"samples":$samplesJson,"cpu":$cpuJson,"rows":$rowsJson,"runs":$runs,"errors":$errs,"failed_runs":${obj(failedRuns)},"sf":$sfJson}"""
    println(summary)
    println(full)
    println(summary)
    // The stdout line is at the mercy of the driver's tail capture, which
    // has truncated it in BOTH directions across rounds (r4 tail, r5 head,
    // r7 lost the whole per-query map → "parsed": null). The file is the
    // artifact of record: full precision, never truncated, and the
    // BENCH_NOTES post-mortems read their samples/cpu/rows from it.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(outPath, full + "\n")
    // ALSO drop the full line at a stable REPO-TRACKED path: the
    // committed BENCH_rNN.json is the driver's stdout tail, which
    // truncates the per-query map away (r10 verdict, "what's wrong"
    // #3) — this file rides the end-of-round commit, so round-over-
    // round per-query regression checks never depend on a side file.
    // resolve the repo root instead of trusting the launch cwd: honor
    // SPARK_GRAFT_REPO_DIR first, else walk up from cwd to the nearest
    // directory holding build.sbt — launching from anywhere inside the
    // repo still lands the file at the tracked top-level path.
    // FILTERED runs (SPARK_GRAFT_ONLY) and SHARD runs skip the repo
    // copy: a one-query iteration run or a 1-of-k partial must not
    // overwrite the full-suite artifact of record
    val repoRoot =
      if (only.isDefined || shard.isDefined) None
      else sys.env.get("SPARK_GRAFT_REPO_DIR")
        .map(java.nio.file.Paths.get(_))
        .orElse {
          Iterator.iterate(
            java.nio.file.Paths.get("").toAbsolutePath)(_.getParent)
            .takeWhile(_ != null).take(8)
            .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
        }
    repoRoot match {
      case Some(rootDir) =>
        val repoCopy = rootDir.resolve("BENCH_FULL_latest.json")
        try java.nio.file.Files.writeString(repoCopy, full + "\n")
        catch {
          case e: java.io.IOException =>
            System.err.println(
              s"bench: SKIPPED repo copy $repoCopy (${e.getMessage}); " +
                s"full JSON remains at $outPath")
        }
      case None =>
        System.err.println(
          "bench: SKIPPED repo copy (filtered SPARK_GRAFT_ONLY run, or no " +
            "SPARK_GRAFT_REPO_DIR and no " +
            s"build.sbt above ${java.nio.file.Paths.get("").toAbsolutePath}); " +
            s"full JSON remains at $outPath")
    }
    spark.stop()
  }
}
