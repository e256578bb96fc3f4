package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming twins of the batch operators (SURVEY.md §2.10:
  * the reference is batch-pull "near-real-time"; these are the Spark
  * extensions its event_time column implies). Each transform takes a
  * (possibly streaming) DataFrame and returns a plan that works
  * identically under `read` and `readStream` — the unified-API property
  * the specs exercise with MemoryStream.
  *
  * Watermarks bound state: at 100 TB/day the 30-minute watermark is what
  * keeps the window/session state store finite; late rows past it are
  * dropped instead of accumulating unbounded state. The `race_partial`
  * scenario of the reference (consumer reads before producer writes) is
  * exactly the late-data problem the watermark solves.
  */
object Streaming {

  /** Tumbling 5-minute windowed aggregation per event_type — the
    * streaming twin of EventsQ.tumblingWindow. Emits append-mode results
    * once the watermark passes the window end.
    */
  def windowedMart(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based session windows (30-minute inactivity gap) per user —
    * the streaming twin of EventsQ.sessionize, via the native
    * session_window operator (state merges adjacent windows within the
    * gap; the watermark finalizes and emits closed sessions).
    */
  def sessionize(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming exact dedup on a content key within the watermark horizon
    * — the streaming twin of Dedup.exactGroups: the state store keeps
    * one entry per key until the event-time watermark retires it, so an
    * infinite stream runs in bounded memory.
    */
  def dedupStream(withKey: DataFrame, keyCol: String,
      watermark: String = "30 minutes"): DataFrame =
    withKey
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)
}
