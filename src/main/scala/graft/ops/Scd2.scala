package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension maintenance — the ONE definition shared by the
  * batch full rebuild (`q_scd2`), the batch incremental merge
  * (`q_scd2_incremental`) and the streaming sink
  * ([[graft.streaming.Streaming.scd2Sink]]), the same
  * batch/stream-share-a-definition contract as
  * [[graft.ops.AnomalyGate]].
  *
  * Change frames are (user_id, event_id, ts_s, value); history rows are
  * (user_id, version, value, valid_from_s, valid_to_s, is_current,
  * last_event_id) with half-open validity intervals
  * [valid_from_s, valid_to_s) ordered by (ts_s, event_id).
  * `last_event_id` — the id of the change that OPENED each version —
  * is maintenance state: it gives [[applyDelta]] an exact per-key
  * high-watermark, and query layers project it away.
  */
object Scd2 {

  private def byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts_s"), col("event_id"))

  /** Full type-2 build over a change frame: consecutive-duplicate
    * records collapse (real SCD2 semantics — a re-stated value opens no
    * version), each surviving change opens a version row. Change
    * detection (lag) and versioning (row_number/lead over the filtered
    * changes) are two window passes over the SAME partitioning and
    * ordering, so the sort-shuffle pays once.
    */
  def build(changes: DataFrame): DataFrame = {
    val chg = changes
      .withColumn("prev", lag(col("value"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    chg
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("value"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"),
        when(col("valid_to_s").isNull, 1).otherwise(0).as("is_current"),
        col("event_id").as("last_event_id"))
  }

  /** Incremental merge — the warehouse CDC shape: apply a delta batch
    * to existing history without re-windowing untouched keys. Keys
    * absent from the delta pass through by anti-join; for touched keys
    * only the single OPEN version row re-enters the window, as the seed
    * the first delta row's duplicate-collapse compares against (valid
    * because a type-2 open version's value always equals the key's last
    * raw change value); closed rows pass through; new versions number
    * from the open version up. At 100 TB the windowed set is
    * |delta| + one row per touched key, never the raw history, and the
    * touched-key semi/anti joins broadcast when the delta is small.
    *
    * Idempotence watermark: each key's open version carries the
    * (valid_from_s, last_event_id) identity of its opening change;
    * delta rows at or before that identity are DROPPED. A redelivered
    * micro-batch is therefore a no-op (at-least-once delivery
    * converges), and the seed provably sorts first in its key's window.
    * Late data below a key's open version is dropped by the same rule —
    * standard watermark semantics, stated here on purpose: splicing a
    * change UNDER existing versions would rewrite closed intervals,
    * which is a rebuild, not a merge.
    */
  def applyDelta(history: DataFrame, delta0: DataFrame): DataFrame = {
    val seeds0 = history.filter(col("is_current") === 1)
      .select(col("user_id"), col("last_event_id").as("event_id"),
        col("valid_from_s").as("ts_s"), col("value"),
        col("version").as("base_version"))
    // watermarks pruned to the delta's keys FIRST (a broadcastable set)
    // so the |all keys|-sized open-version frame is only ever semi-joined
    // against small sets, never shuffled whole into the left join
    val touched0 = delta0.select(col("user_id")).distinct()
    val wm = seeds0.select(col("user_id"), col("ts_s").as("wm_ts"),
        col("event_id").as("wm_eid"))
      .join(touched0, Seq("user_id"), "left_semi")
    val delta = delta0.join(wm, Seq("user_id"), "left")
      .filter(col("wm_ts").isNull || col("ts_s") > col("wm_ts") ||
        (col("ts_s") === col("wm_ts") && col("event_id") > col("wm_eid")))
      .drop("wm_ts", "wm_eid")
    val touched = delta.select(col("user_id")).distinct()
    val untouched = history.join(touched, Seq("user_id"), "left_anti")
    val closed = history.filter(col("is_current") === 0)
      .join(touched, Seq("user_id"), "left_semi")
      .drop("is_current")
    val seeds = seeds0.join(touched, Seq("user_id"), "left_semi")
    val wholeKey = Window.partitionBy(col("user_id"))
    val kept = seeds
      .unionByName(delta.withColumn("base_version", lit(null).cast("long")))
      .withColumn("prev", lag(col("value"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    val merged = kept
      // delta-only keys have no seed: max() skips nulls -> base 1
      .withColumn("base",
        coalesce(max(col("base_version")).over(wholeKey), lit(1L)))
      .withColumn("version", col("base") + row_number().over(byUser) - lit(1))
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("value"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"),
        col("event_id").as("last_event_id"))
    untouched.drop("is_current").unionByName(closed).unionByName(merged)
      .withColumn("is_current",
        when(col("valid_to_s").isNull, 1).otherwise(0))
      .select(col("user_id"), col("version"), col("value"),
        col("valid_from_s"), col("valid_to_s"), col("is_current"),
        col("last_event_id"))
  }

  /** Merge a change batch into the parquet history at `dir` with the
    * crash-safe rename swap ([[graft.etl.Upsert.replaceParquet]]):
    * first batch builds, later batches merge. The streaming sink's
    * per-micro-batch body.
    */
  def mergeIntoParquet(spark: SparkSession, dir: String,
      changes: DataFrame): Unit =
    graft.etl.Upsert.replaceParquet(spark, dir) {
      case Some(history) => applyDelta(history, changes)
      case None => build(changes)
    }
}
