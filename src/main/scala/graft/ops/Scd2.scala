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
  * last_event_id, seen_ts_s, seen_event_id) with half-open validity
  * intervals [valid_from_s, valid_to_s) ordered by (ts_s, event_id).
  * The last three columns are maintenance state, projected away by the
  * query layers: `last_event_id` is the id of the change that OPENED
  * the version (it orders the merge seed), and `seen_ts_s`/
  * `seen_event_id` on each key's OPEN row are the max (ts_s, event_id)
  * the key has ever OBSERVED — strictly later than the open version's
  * valid_from whenever duplicate re-statements collapsed, which is why
  * the watermark must track observation, not the version boundary.
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
      // the observation watermark, computed BEFORE duplicate-collapse:
      // a collapsed re-statement advances what the key has seen even
      // though it opens no version
      .withColumn("wm",
        max(struct(col("ts_s"), col("event_id")))
          .over(Window.partitionBy(col("user_id"))))
      .withColumn("prev", lag(col("value"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    chg
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("value"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"),
        when(col("valid_to_s").isNull, 1).otherwise(0).as("is_current"),
        col("event_id").as("last_event_id"),
        col("wm.ts_s").as("seen_ts_s"),
        col("wm.event_id").as("seen_event_id"))
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
    * Idempotence watermark: each key's open row carries the max
    * (ts_s, event_id) the key has ever OBSERVED — including duplicate
    * re-statements that collapsed without opening a version — and delta
    * rows at or before that identity are DROPPED. A redelivered
    * micro-batch is therefore a no-op (at-least-once delivery
    * converges), and the seed provably sorts first in its key's window
    * (every passing row exceeds the watermark, which is at least the
    * seed's identity). Late data below the watermark is dropped by the
    * same rule — standard watermark semantics, stated on purpose:
    * splicing a change under what the stream has already observed would
    * rewrite settled intervals, which is a rebuild, not a merge.
    */
  def applyDelta(history: DataFrame, delta0: DataFrame): DataFrame = {
    val seeds0 = history.filter(col("is_current") === 1)
      .select(col("user_id"), col("last_event_id").as("event_id"),
        col("valid_from_s").as("ts_s"), col("value"),
        col("version").as("base_version"))
    // watermarks pruned to the delta's keys FIRST (a broadcastable set)
    // so the |all keys|-sized open-version frame is only ever semi-joined
    // against small sets, never shuffled whole into the left join. The
    // watermark is the key's max OBSERVED (ts, event_id) — NOT the open
    // version's valid_from: a collapsed re-statement advanced
    // observation without opening a version, and a late row landing
    // between the two would otherwise splice in as "current" when the
    // stream has already seen a later value
    val touched0 = delta0.select(col("user_id")).distinct()
    val wm = history.filter(col("is_current") === 1)
      .select(col("user_id"), col("seen_ts_s").as("wm_ts"),
        col("seen_event_id").as("wm_eid"))
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
      // the new observation watermark: every passing delta row exceeds
      // the old one, so the max over seed ∪ passing delta is the max
      // over everything the key has ever observed
      .withColumn("wm", max(struct(col("ts_s"), col("event_id")))
        .over(Window.partitionBy(col("user_id"))))
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
        col("event_id").as("last_event_id"),
        col("wm.ts_s").as("seen_ts_s"),
        col("wm.event_id").as("seen_event_id"))
    untouched.drop("is_current").unionByName(closed).unionByName(merged)
      .withColumn("is_current",
        when(col("valid_to_s").isNull, 1).otherwise(0))
      .select(col("user_id"), col("version"), col("value"),
        col("valid_from_s"), col("valid_to_s"), col("is_current"),
        col("last_event_id"), col("seen_ts_s"), col("seen_event_id"))
  }

  /** Merge a change batch into the parquet history at `dir` with the
    * crash-safe rename swap ([[graft.etl.Upsert.replaceParquet]]):
    * first batch builds, later batches merge. The streaming sink's
    * per-micro-batch body.
    *
    * I/O caveat: the COMPUTE is |delta| + touched keys, but plain
    * parquet has no in-place update, so the swap REWRITES the whole
    * history per batch — the upsertSink trade-off. On a real deployment
    * the same [[applyDelta]] output feeds MERGE INTO on a table format
    * (Delta/Iceberg) whose commit is row-level and truly atomic.
    */
  def mergeIntoParquet(spark: SparkSession, dir: String,
      changes: DataFrame): Unit =
    graft.etl.Upsert.replaceParquet(spark, dir) {
      case Some(history) => applyDelta(history, changes)
      case None => build(changes)
    }
}
