package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The z-score anomaly gate split into its two halves so batch and
  * streaming share ONE definition of both:
  *
  *  - [[moments]] — the per-group baseline (exact DECIMAL Σx/Σx², so
  *    the moments are bit-deterministic; degenerate zero-variance
  *    groups are dropped rather than flagging everything as NaN);
  *  - [[gate]] — score any (event_id, event_type, value) rows against
  *    a moment table, emit rows beyond the threshold.
  *
  * Batch trains the baseline and gates the same corpus
  * (`q_outliers`); the streaming sink gates each micro-batch against
  * the PERSISTED baseline — the deploy shape, where the model is
  * yesterday's moments and the traffic is today's events.
  */
object AnomalyGate {

  /** (event_type, mean, sd) — sd > 0 only. */
  def moments(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("value").cast(DecimalType(18, 6)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n").cast("double"))
      // degenerate guard: clamp tiny-negative variance, drop sd = 0
      // groups — no variance means no outliers, not all-NaN outliers
      .withColumn("sd", sqrt(greatest(
        col("s2").cast("double") / col("n").cast("double") -
          col("mean") * col("mean"), lit(0.0))))
      .filter(col("sd") > lit(0.0))
      .select(col("event_type"), col("mean"), col("sd"))

  /** Rows more than `threshold`·σ from their group mean, scored against
    * an explicit moment table.
    */
  def gate(events: DataFrame, moments: DataFrame,
      threshold: Double = 3.0): DataFrame =
    events
      .select(col("event_id"), col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("x"))
      .join(broadcast(moments), "event_type")
      .withColumn("xd", col("x").cast("double"))
      .withColumn("z", (col("xd") - col("mean")) / col("sd"))
      .filter(abs(col("z")) > lit(threshold))
      .select(col("event_id"), col("event_type"), col("xd").as("value"),
        round(col("z"), 6).as("z"))
}
