package graft

/** Dev utility: print the executed physical plan of one SparkEntry
  * query — `runMain graft.PlanDump <sfDir> <query>`. The fastest way to
  * audit a plan shape (pushdown, join strategy, exchange reuse) before
  * pinning it in PlanSpec.
  *
  * `runMain graft.PlanDump --pruned <sfDir>` scans the WHOLE registry
  * and prints the members whose optimized plan is pure-projection
  * shaped — no Aggregate/Join/Window/Generate/Expand node anywhere —
  * i.e. exactly the members for which the pre-r17 `.count()` bench sink
  * let Catalyst prune every computed column, timing a parquet row-count
  * scan instead of the member's work (VERDICT r16 "what's missing" #1).
  * The list is the enumeration behind the BENCH_NOTES r17 sink-bridge
  * table; it is diagnostic, not load-bearing — the noop sink fixes all
  * members regardless of shape.
  *
  * `runMain graft.PlanDump --formatted <sfDir> <query>` prints
  * `explain("formatted")` instead — the before/after plan artifact the
  * r18 optimization round commits under plans/r18/.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val pruned = args.headOption.contains("--pruned")
    val formatted = args.headOption.contains("--formatted")
    val sfDir = if (pruned || formatted) args(1) else args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config(new org.apache.spark.SparkConf().setAll(Tables.sessionConfs))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (formatted) {
      println(SparkEntry.queries(args(2))(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    } else if (!pruned) {
      println(SparkEntry.queries(args(1))(spark, args(0))
        .queryExecution.executedPlan.toString)
    } else {
      import org.apache.spark.sql.catalyst.plans.logical._
      def projectionShaped(p: LogicalPlan): Boolean = p.collectFirst {
        case _: Aggregate => (); case _: Join => ()
        case _: Window => (); case _: Generate => (); case _: Expand => ()
      }.isEmpty
      val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val shape =
          try {
            if (projectionShaped(SparkEntry
              .queries(name)(spark, sfDir).queryExecution.optimizedPlan))
              "pruned" else "full"
          } catch { case e: Throwable =>
            s"build_error: ${e.getClass.getSimpleName}" }
        out(name) = shape
        System.err.println(s"$name\t$shape")
      }
      val prunedNames = out.collect { case (n, "pruned") => n }.toSeq
      val errs = out.collect { case (n, s) if s.startsWith("build_error") =>
        s"${Json.str(n)}:${Json.str(s)}" }
      println(s"""{"pruned":[${prunedNames.map(Json.str).mkString(",")}],""" +
        s""""n_pruned":${prunedNames.size},"n_total":${out.size},""" +
        s""""build_errors":{${errs.mkString(",")}}}""")
    }
    spark.stop()
  }
}
