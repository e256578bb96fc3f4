package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Wire shape for the custom stateful operators. */
final case class UserEvent(event_id: Long, user_id: Long,
    ts: java.sql.Timestamp, value: Double)

/** A closed session emitted by [[Streaming.statefulSessions]]. */
final case class UserSession(user_id: Long, start_s: Long, end_s: Long,
    n_events: Long, total_value: Double)

private[streaming] final case class SessionAcc(start: Long, last: Long,
    n: Long, total: Double)

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

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for state machines session_window can't express
    * (here: sessions also emit on event-time TIMEOUT, so an abandoned
    * session closes when the watermark passes its gap even if the user
    * never returns). One state entry per active user, retired on
    * timeout — bounded by active users, not history.
    */
  def statefulSessions(events: Dataset[UserEvent],
      gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[UserEvent], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(user, s.start, s.last, s.n, s.total))
          } else {
            // fold the batch in event-time order, closing a session at
            // every gap — including gaps BETWEEN events of this batch,
            // which a batch-min/max merge would silently swallow
            val closed = Seq.newBuilder[UserSession]
            var acc = state.getOption
            for (e <- evs.toSeq.sortBy(_.ts.getTime)) {
              val s = e.ts.getTime / 1000
              acc match {
                case Some(a) if s > a.last + gapSeconds =>
                  closed += UserSession(user, a.start, a.last, a.n, a.total)
                  acc = Some(SessionAcc(s, s, 1L, e.value))
                case Some(a) =>
                  acc = Some(SessionAcc(a.start, math.max(a.last, s),
                    a.n + 1, a.total + e.value))
                case None =>
                  acc = Some(SessionAcc(s, s, 1L, e.value))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp((a.last + gapSeconds) * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream–stream interval join: enrich a click/event stream with the
    * orders/transactions stream that happened within `horizon` BEFORE
    * the event, keyed by user. Both sides are watermarked and the join
    * condition bounds event-time distance, so state for either side is
    * retired once the watermark passes the interval — the canonical
    * bounded-state stream-stream join shape.
    */
  def intervalJoin(events: DataFrame, txns: DataFrame,
      horizon: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val e = events.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts").as("event_ts"))
    val t = txns.withWatermark("ts", watermark)
      .select(col("user_id").as("t_user"), col("txn_id"),
        col("ts").as("txn_ts"), col("value"))
    e.join(t,
      col("user_id") === col("t_user") &&
        col("txn_ts") >= col("event_ts") - expr(s"INTERVAL $horizon") &&
        col("txn_ts") <= col("event_ts"))
      .select(col("user_id"), col("event_id"), col("event_ts"),
        col("txn_id"), col("txn_ts"), col("value"))
  }

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

  /** Stream–STATIC dim enrichment: the streaming twin of
    * Enricher.enrich — each micro-batch joins the (small, slowly
    * changing) dimension tables, which broadcast per batch; no
    * streaming state at all. This is the most common production
    * streaming join: facts stream, dims don't.
    */
  def enrichStream(txns: DataFrame, dimStore: DataFrame,
      dimProduct: DataFrame): DataFrame =
    txns
      .join(dimStore, Seq("store_id"))
      .join(dimProduct, Seq("sku"))
      .withColumn("revenue_cents",
        col("quantity").cast("long") * col("unit_price_cents").cast("long"))

  /** Micro-batch keyed upsert sink via foreachBatch: each batch merges
    * into the parquet warehouse with the SAME last-write-wins semantics
    * as the batch path ([[graft.etl.Upsert.upsertParquet]]) — the
    * pattern for sinks Structured Streaming cannot express natively
    * (upsert, MERGE, JDBC). foreachBatch gives at-least-once delivery;
    * the keyed upsert makes redelivery idempotent, which is exactly the
    * reference's run_id/txn_id re-run contract.
    */
  def upsertSink(enriched: DataFrame, warehouseDir: String,
      keys: Seq[String], versionCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    enriched.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Upsert.upsertParquet(batch.sparkSession, warehouseDir,
          batch, keys, versionCol)
      }
}
