package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

final case class Ev(event_id: Long, user_id: Long, event_type: String,
    ts: Timestamp, value: Double)

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def t(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private def runToCompletion(stream: org.apache.spark.sql.DataFrame,
      name: String, mode: OutputMode): org.apache.spark.sql.DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("windowedMart aggregates 5-minute event-time windows per type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, 1, "click", t(0, 10), 1.0),
      Ev(2, 1, "click", t(3, 50), 2.0),
      Ev(3, 2, "view", t(4, 0), 5.0),
      Ev(4, 1, "click", t(7, 0), 4.0),
      // event far in the future pushes the watermark past every window
      Ev(99, 9, "tick", Timestamp.valueOf("2024-01-01 12:00:00"), 0.0))
    val out = runToCompletion(Streaming.windowedMart(in.toDF()),
      "mart_sink", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(out.contains(("2024-01-01 10:00:00.0", "view", 1L, 5.0)))
    assert(out.contains(("2024-01-01 10:05:00.0", "click", 1L, 4.0)))
  }

  test("sessionize merges events within the gap and splits across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, 1, "click", t(0), 1.0),
      Ev(2, 1, "click", t(10), 2.0), // same session (10 < 30 gap)
      Ev(3, 1, "click", t(50), 4.0), // new session (40 min gap)
      Ev(4, 2, "view", t(5), 8.0),
      Ev(99, 9, "tick", Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
    val out = runToCompletion(Streaming.sessionize(in.toDF()),
      "session_sink", OutputMode.Append())
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(out.contains((1L, 2L, 3.0))) // user 1, first session: 2 events
    assert(out.contains((1L, 1L, 4.0))) // user 1, second session
    assert(out.contains((2L, 1L, 8.0)))
  }

  test("dedupStream keeps first occurrence per key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, 1, "click", t(0), 1.0),
      Ev(2, 1, "click", t(1), 1.0), // dup of event_type+user within watermark
      Ev(3, 2, "click", t(2), 1.0))
    val deduped = Streaming.dedupStream(
      in.toDF().withColumn("key",
        org.apache.spark.sql.functions.concat_ws("-",
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"))),
      "key")
    val out = runToCompletion(deduped, "dedup_sink", OutputMode.Append())
    assert(out.count() == 2)
    assert(out.select("event_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
