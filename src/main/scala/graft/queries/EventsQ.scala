package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-time operators over the `events` table — the batch twins of the
  * Structured Streaming layer (SURVEY.md §2.10: the reference is batch-only;
  * event-time windowing is the natural Spark extension of its
  * `event_time TIMESTAMPTZ` column, sql/init.sql:20).
  *
  * Second-granularity epoch math (`unix_timestamp`) is used for gap logic so
  * the DuckDB oracle can reproduce it exactly (`floor(epoch(ts))`).
  */
object EventsQ {

  /** Tumbling 5-minute window aggregation — batch twin of the streaming
    * windowed agg. Spark's `window()` floors to epoch-aligned buckets.
    */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** HOPPING (sliding) event-time windows: 10-minute windows every 5
    * minutes — each event lands in size/slide = 2 overlapping windows
    * (Spark's `window(ts, size, slide)` plans the 2× Generate + one
    * hash aggregation). The batch twin of streaming sliding aggregation;
    * the oracle replays the window membership with an UNNEST over the
    * two per-event window starts.
    */
  def hoppingWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "600 seconds", "300 seconds"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** Session windows via gap > 30 min: lag + cumulative-sum-of-new-session
    * flags. This is the classic sessionization shape; one shuffle on
    * user_id, then two window passes over the same partitioning (Spark
    * reuses the exchange). The streaming equivalent is
    * `session_window(ts, "30 minutes")` in graft.streaming.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_s")).as("start_s"),
        max(col("ts_s")).as("end_s"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
  }

  /** Per-user running totals ordered by event time — windowed cumulative
    * aggregation (frame: unbounded preceding → current row).
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 2))).over(cum).cast("double"))
      .withColumn("seq", row_number().over(byUser).cast("long"))
      .select(col("event_id"), col("user_id"), col("seq"), col("running_value"))
  }

  /** Ordered-step funnel (view → click → purchase): a user reaches stage
    * k only via events AT OR AFTER their stage-(k−1) entry time, so the
    * steps are genuinely sequential (a purchase before the first view
    * does not count). Shape: one min-aggregation per stage, every
    * groupBy/join keyed on user_id — the per-user frames are
    * aggregate-sized and co-partitioned, so the three stages cost one
    * user_id shuffle plus exchange-reused joins; the corpus is scanned
    * once per stage predicate, never per user. The final 3-row unpivot
    * is metadata-sized.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
    val s1 = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts_s"))).as("s1"))
    val s2 = ev.join(s1, "user_id")
      .groupBy(col("user_id"), col("s1"))
      .agg(min(when(col("event_type") === "click" && col("ts_s") >= col("s1"),
        col("ts_s"))).as("s2"))
    val s3 = ev.join(s2.select("user_id", "s2"), "user_id")
      .groupBy(col("user_id"), col("s2"))
      .agg(min(when(col("event_type") === "purchase" && col("ts_s") >= col("s2"),
        col("ts_s"))).as("s3"))
    def stageRow(df: DataFrame, c: String, stage: Int, step: String) =
      df.agg(count(col(c)).as("users"))
        .select(lit(stage).as("stage"), lit(step).as("step"), col("users"))
    stageRow(s1, "s1", 1, "view")
      .unionByName(stageRow(s2, "s2", 2, "click"))
      .unionByName(stageRow(s3, "s3", 3, "purchase"))
  }

  /** SCD Type-2 dimension build from a change stream: per user, each
    * CHANGE of the tracked attribute (consecutive-duplicate records
    * collapse, real type-2 semantics) opens a version row with a
    * half-open validity interval [valid_from_s, valid_to_s); the open
    * version has NULL valid_to_s and is_current = 1. Change detection
    * (lag) and versioning (row_number/lead over the filtered changes)
    * are two window passes over the SAME (user_id, ts, event_id)
    * partitioning+ordering, so the sort-shuffle pays once.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    scd2From(clickChanges(spark, dir))

  /** The click change stream: (user_id, event_id, ts_s, value). */
  private def clickChanges(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"))

  /** Full SCD2 build over a change frame (see [[scd2]] for semantics). */
  private def scd2From(clicks: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val changes = clicks
      .withColumn("prev", lag(col("value"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    changes
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("value"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"),
        when(col("valid_to_s").isNull, 1).otherwise(0).as("is_current"))
  }

  def scd2Incremental(spark: SparkSession, dir: String): DataFrame =
    scd2Incremental(spark, dir, "2024-01-24", "scd2-history")

  /** Incremental SCD2 merge — the warehouse CDC shape: apply a delta
    * batch of changes to a PERSISTED history without re-windowing
    * untouched keys. Keys absent from the delta pass through the merge
    * by anti-join; for keys the delta touches, only their single OPEN
    * version row re-enters the window — it becomes the seed the first
    * delta row's duplicate-collapse compares against (valid because a
    * type-2 open version's value always equals the key's last raw
    * change value), closed rows pass through, and new versions number
    * from the open version up. At 100 TB the windowed set is
    * |delta| + one row per touched key, never the raw history; the
    * touched-key semi/anti joins broadcast when the delta is small.
    * The DuckDB oracle is the FULL rebuild over all clicks, so the
    * hash-match IS the incremental ≡ full proof. The state artifact
    * key includes the cut (same rationale as the incremental mart).
    */
  def scd2Incremental(spark: SparkSession, dir: String,
      cutDate: String, artifactName: String): DataFrame = {
    val cutS = lit(cutDate).cast("timestamp").cast("long")
    val clicks = clickChanges(spark, dir)
    val statePath = graft.ops.StageArtifacts.ensure(
        dir, s"$artifactName-$cutDate") { out =>
      scd2From(clicks.filter(col("ts_s") < cutS))
        .write.mode("overwrite").parquet(out)
    }
    val history = spark.read.parquet(statePath)
    val delta = clicks.filter(col("ts_s") >= cutS)
    val touched = delta.select(col("user_id")).distinct()
    val untouched = history.join(touched, Seq("user_id"), "left_anti")
    val touchedHist = history.join(touched, Seq("user_id"), "left_semi")
    val closed = touchedHist.filter(col("is_current") === 0)
      .drop("is_current")
    // the open version re-enters the window as a seed row; its
    // ts_s < cut <= every delta ts_s, so it always sorts first and the
    // event_id tiebreak (-1, the real id is not in history) is inert
    val seeds = touchedHist.filter(col("is_current") === 1)
      .select(col("user_id"), lit(-1L).as("event_id"),
        col("valid_from_s").as("ts_s"), col("value"),
        col("version").as("base_version"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val wholeKey = Window.partitionBy(col("user_id"))
    val kept = seeds
      .unionByName(delta.withColumn("base_version", lit(null).cast("long")))
      .withColumn("prev", lag(col("value"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    val merged = kept
      // delta-only keys have no seed: max() skips nulls -> base 1
      .withColumn("base", coalesce(max(col("base_version")).over(wholeKey), lit(1L)))
      .withColumn("version", col("base") + row_number().over(byUser) - lit(1))
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("value"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"))
    untouched.drop("is_current").unionByName(closed).unionByName(merged)
      .withColumn("is_current",
        when(col("valid_to_s").isNull, 1).otherwise(0))
  }

  /** Cohort retention: users grouped by their FIRST-seen day (epoch-day
    * cohort), counted as retained k days after it (k = activity day −
    * cohort day). The classic product-analytics matrix; shape is one
    * min-aggregation per user (map-side combinable) + one distinct
    * count per (cohort, k) — both shuffles on small keys, corpus never
    * re-scanned per cohort.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(firstSeen, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("k"))
      .agg(countDistinct(col("user_id")).as("users"))
      .filter(col("k") <= 7)
  }

  /** Time-series gap filling / regularization: hourly event counts per
    * type with EVERY hour of each type's [first, last] span present,
    * missing hours zero-filled — the resampling step before any
    * windowed model sees the series (a gap read as "no row" silently
    * skews moving averages and anomaly baselines).
    *
    * Scale shape: the count aggregate is the only corpus-sized pass;
    * the scaffold (per-type min/max + one `sequence` explode) is
    * |types × hours| — metadata-sized — and the zero-fill is a left
    * join of scaffold onto counts, shuffling only bucket rows.
    */
  def gapFillHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
    val counts = ev.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val scaffold = counts.groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"), explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    scaffold.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Trailing 7-hour moving average over the GAP-FILLED hourly series —
    * the moving-window baseline a monitoring/anomaly layer reads. Runs
    * on the regularized series because a gap read as "no row" silently
    * shrinks the window divisor; with zeros filled, the average is over
    * actual hours. The leading partial windows divide by the true
    * window size (count), not 7.
    *
    * Integer sums / integer counts → one exact double division:
    * cross-engine deterministic with no rounding step. One keyed window
    * per event_type — no single-partition exchange.
    */
  def movingAverage(spark: SparkSession, dir: String): DataFrame = {
    val series = gapFillHourly(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
    series
      .withColumn("ma7",
        sum(col("n")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double"))
      .select(col("event_type"), col("hour"), col("n"), col("ma7"))
  }
}
