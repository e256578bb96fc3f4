package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

final case class Ev(event_id: Long, user_id: Long, event_type: String,
    ts: Timestamp, value: Double)

final case class Txn(txn_id: String, store_id: String, sku: String,
    quantity: Int, unit_price_cents: Int)

final case class Fact(run_id: String, txn_id: String, v: Double,
    inserted_at: Timestamp)

final case class Doc(doc_id: Long, text: String)

final case class SrcDoc(doc_id: Long, source: String, text: String)

final case class Chg(user_id: Long, event_id: Long, ts_s: Long,
    value: Double)

final case class QVec(vec_id: Long, embedding: Array[Float])

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

  test("q_stream_mart: bounded streaming execution == batch tumbling window") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val streamed = rows(graft.queries.EventsQ.streamMart(spark, dir))
    val batch = rows(graft.queries.EventsQ.tumblingWindow(spark, dir))
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("forgetSink: sequential deletion batches compose to the batch forget; redelivery no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the ForgetSpec chain corpus: 1~2~3 (bridge at 2) + exact pair {100, 101}
    def t(a: Int, b: Int, p: String) = (a to b).map(i => s"$p$i").mkString(" ")
    val corpus = Seq((1L, t(1, 40, "t")), (2L, t(5, 44, "t")),
      (3L, t(9, 48, "t")), (100L, t(1, 40, "u")), (101L, t(1, 40, "u")))
      .toDF("doc_id", "text")
    val pairsAmong: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      ids => graft.dedup.Dedup.jaccardPairs(
        corpus.join(ids, Seq("doc_id"), "left_semi"), "doc_id", "text")
    val artifact = java.nio.file.Files
      .createTempDirectory("forget-sink").toString + "/labels"
    graft.dedup.Dedup.clusterLabels(corpus, "doc_id",
        graft.dedup.Dedup.jaccardPairs(corpus, "doc_id", "text"))
      .write.mode("overwrite").parquet(artifact)
    def labels() = spark.read.parquet(artifact).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val in = MemoryStream[Doc]
    val q = Streaming.forgetSink(in.toDF().select("doc_id"), artifact,
      pairsAmong).start()
    try {
      // batch 1: delete the bridge — the chain cluster must SPLIT
      in.addData(Doc(2L, "")); q.processAllAvailable()
      assert(labels() == Set((1L, 1L), (3L, 3L), (100L, 100L), (101L, 100L)))
      // batch 2: delete the other cluster's minimum — re-election; the
      // two patches compose to the batch forget of {2, 100}
      in.addData(Doc(100L, "")); q.processAllAvailable()
      assert(labels() == Set((1L, 1L), (3L, 3L), (101L, 101L)))
      // redelivery: already-forgotten ids are a no-op patch
      in.addData(Doc(2L, ""), Doc(100L, "")); q.processAllAvailable()
      assert(labels() == Set((1L, 1L), (3L, 3L), (101L, 101L)))
    } finally q.stop()
  }

  test("q_stream_sliding: bounded streaming execution == batch hopping window") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val streamed = rows(graft.queries.EventsQ.streamSliding(spark, dir))
    val batch = rows(graft.queries.EventsQ.hoppingWindow(spark, dir))
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("sessionizeSeconds: gap boundary is end-INCLUSIVE (diff == gap merges, gap+1 splits)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 10:00:00.700").getTime
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, 1, "click", new Timestamp(base), 1.0),
      // floor-second diff exactly 1800 → same session as event 1 (the
      // boundary pair the sf0.01 oracle exposed: Spark session windows
      // merge when next.start == prev.end)
      Ev(2, 1, "click", new Timestamp(base + 1800 * 1000L + 100), 2.0),
      // floor-second diff 1801 from event 2 → new session
      Ev(3, 1, "click", new Timestamp(base + 3601 * 1000L + 200), 4.0))
    val out = runToCompletion(Streaming.sessionizeSeconds(in.toDF()),
      "sessionsec_sink", OutputMode.Complete())
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0)))
  }

  test("q_stream_sessions: native session_window streaming == batch gap sessionize") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_id", "n_events", "start_s", "end_s",
        "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    val streamed = rows(graft.queries.EventsQ.streamSessions(spark, dir))
    val batch = rows(graft.queries.EventsQ.sessionize(spark, dir))
    assert(batch.nonEmpty)
    // non-vacuity: some session must actually MERGE events (n_events > 1),
    // otherwise the gap rule was never exercised
    assert(streamed.exists(_._3 > 1))
    assert(streamed == batch)
  }

  test("q_stream_scd2: streamed persisted history == batch scd2 build") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "version", "value", "valid_from_s", "valid_to_s",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getInt(5))).toSet
    val streamed = rows(graft.queries.EventsQ.streamScd2(spark, dir))
    val batch = rows(graft.queries.EventsQ.scd2(spark, dir))
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // a second run over the wiped state dir is identical (run-to-run
    // determinism of the registered query, not just stream ≡ batch)
    assert(rows(graft.queries.EventsQ.streamScd2(spark, dir)) == streamed)
  }

  test("q_stream_ann_serve: stream-served quantized top-k == batch quantized ranking") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val served = rows(graft.queries.AnnQ.streamAnnServe(spark, dir))
    val batch = rows(graft.queries.AnnQ.bruteTopKQuantized(spark, dir))
    assert(batch.nonEmpty)
    assert(served == batch)
  }

  test("slidingMart: each event lands in size/slide overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, 1, "click", t(7, 0), 3.0), // windows [10:00,10:10) and [10:05,10:15)
      Ev(99, 9, "tick", Timestamp.valueOf("2024-01-01 12:00:00"), 0.0))
    val out = runToCompletion(Streaming.slidingMart(in.toDF()),
      "sliding_sink", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(out.contains(("2024-01-01 10:00:00.0", "click", 1L, 3.0)))
    assert(out.contains(("2024-01-01 10:05:00.0", "click", 1L, 3.0)))
    assert(out.count(_._2 == "click") == 2) // exactly size/slide windows
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

  test("intervalJoin matches txns within the horizon before each event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[Ev]
    val tx = MemoryStream[Ev] // reuse the shape; event_id plays txn num
    ev.addData(
      Ev(100, 1, "click", t(40), 0.0),
      Ev(99, 9, "tick", Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
    tx.addData(
      Ev(1, 1, "txn", t(20), 5.0), // 20 min before event 100: joins
      Ev(2, 1, "txn", t(45), 7.0), // after the event: no join
      Ev(3, 2, "txn", t(39), 9.0), // other user: no join
      Ev(99, 9, "txn", Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
    val joined = Streaming.intervalJoin(
      ev.toDF(),
      tx.toDF().withColumnRenamed("event_id", "txn_id"))
    val out = runToCompletion(joined, "ij_sink", OutputMode.Append())
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("txn_id")))
      .filter(_._1 != 99L).toSet
    assert(out == Set((100L, 1L)))
  }

  test("statefulSessions closes a session on event-time timeout (abandoned user)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    in.addData(
      UserEvent(1, 1, t(0), 1.0),
      UserEvent(2, 1, t(10), 2.0)) // same session
    val q = Streaming.statefulSessions(in.toDS())
      .writeStream.format("memory").queryName("ss_sink")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // user 1 never returns; a later event for another user advances the
    // watermark past start+gap, firing the event-time timeout
    in.addData(UserEvent(99, 9, Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(UserEvent(100, 9, Timestamp.valueOf("2024-01-01 13:30:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ss_sink").as[UserSession].collect()
      .filter(_.user_id == 1L)
    assert(out.length == 1)
    val s = out.head
    assert(s.n_events == 2 && s.total_value == 3.0)
    assert(s.end_s - s.start_s == 600)
  }

  test("statefulSessions splits a gap INSIDE one micro-batch into two sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    // both events in ONE batch, 3h apart (gap 30min): must become two sessions
    in.addData(
      UserEvent(1, 1, t(0), 1.0),
      UserEvent(2, 1, Timestamp.valueOf("2024-01-01 13:00:00"), 2.0))
    val q = Streaming.statefulSessions(in.toDS())
      .writeStream.format("memory").queryName("ss_split_sink")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    in.addData(UserEvent(99, 9, Timestamp.valueOf("2024-01-01 16:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(UserEvent(100, 9, Timestamp.valueOf("2024-01-01 17:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ss_split_sink").as[UserSession].collect()
      .filter(_.user_id == 1L).sortBy(_.start_s)
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0).n_events == 1 && out(0).total_value == 1.0)
    assert(out(1).n_events == 1 && out(1).total_value == 2.0)
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

  test("enrichStream: stream-static dim join enriches per micro-batch, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Txn]
    in.addData(
      Txn("t1", "SFO-001", "SKU-MILK", 2, 299),
      Txn("t2", "NYC-014", "SKU-RICE", 1, 899),
      Txn("t3", "SFO-001", "NO-SUCH-SKU", 1, 100)) // referential breach drops
    val enriched = Streaming.enrichStream(in.toDF(),
      graft.etl.Enricher.dimStore(spark), graft.etl.Enricher.dimProduct(spark))
    val out = runToCompletion(enriched, "enrich_sink", OutputMode.Append())
      .collect().map(r => (r.getAs[String]("txn_id"),
        r.getAs[String]("region"), r.getAs[String]("category"),
        r.getAs[Long]("revenue_cents"))).toSet
    assert(out == Set(
      ("t1", "west", "dairy", 598L),
      ("t2", "east", "pantry", 899L)))
  }

  test("upsertSink: micro-batch keyed upsert is idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("stream_wh").toString + "/fct"
    val in = MemoryStream[Fact]
    in.addData(
      Fact("r1", "a", 1.0, t(0)),
      Fact("r1", "b", 2.0, t(1)))
    val q = Streaming.upsertSink(in.toDF(), wh,
      keys = Seq("run_id", "txn_id"), versionCol = "inserted_at").start()
    q.processAllAvailable()
    // "redelivery": the same key arrives again with a newer version —
    // last write wins, no duplicate row
    in.addData(Fact("r1", "a", 9.0, t(5)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(wh)
      .collect().map(r => (r.getAs[String]("txn_id"), r.getAs[Double]("v"))).toSet
    assert(rows == Set(("a", 9.0), ("b", 2.0)))
  }

  test("publishForgetSink: per-batch versions advance, old version stays readable, redelivery republishes identical content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(a: Int, b: Int, p: String) = (a to b).map(i => s"$p$i").mkString(" ")
    val corpus = Seq((1L, t(1, 40, "t")), (2L, t(5, 44, "t")),
      (3L, t(9, 48, "t")), (100L, t(1, 40, "u")), (101L, t(1, 40, "u")))
      .toDF("doc_id", "text")
    val pairsAmong: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      ids => graft.dedup.Dedup.jaccardPairs(
        corpus.join(ids, Seq("doc_id"), "left_semi"), "doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("pub-forget").toString + "/store"
    val base = graft.dedup.Dedup.clusterLabels(corpus, "doc_id",
      graft.dedup.Dedup.jaccardPairs(corpus, "doc_id", "text"))
    graft.ops.Publish.publish(spark, store, Map(
      "clusters" -> (p => base.write.mode("overwrite").parquet(p))))
    def labelsAt(path: String) = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def current() = labelsAt(graft.ops.Publish.current(spark, store)("clusters"))
    val in = MemoryStream[Doc]
    val q = Streaming.publishForgetSink(in.toDF().select("doc_id"), store,
      pairsAmong).start()
    try {
      val v1Path = graft.ops.Publish.current(spark, store)("clusters")
      val v1 = labelsAt(v1Path)
      // batch 1: delete the bridge — v2 splits the chain; v1 STILL reads
      // as the pre-forget labels (the mid-stream reader grace window)
      in.addData(Doc(2L, "")); q.processAllAvailable()
      assert(graft.ops.Publish.currentVersion(spark, store) === Some(2L))
      assert(current() == Set((1L, 1L), (3L, 3L), (100L, 100L), (101L, 100L)))
      assert(labelsAt(v1Path) == v1, "previous version must stay intact")
      // batch 2: min-id deletion composes; version advances again
      in.addData(Doc(100L, "")); q.processAllAvailable()
      assert(graft.ops.Publish.currentVersion(spark, store) === Some(3L))
      assert(current() == Set((1L, 1L), (3L, 3L), (101L, 101L)))
      // redelivery: a new version publishes but its CONTENT is identical
      in.addData(Doc(2L, ""), Doc(100L, "")); q.processAllAvailable()
      assert(current() == Set((1L, 1L), (3L, 3L), (101L, 101L)))
      // and one rollback undoes the (idempotent) redelivery version
      graft.ops.Publish.rollback(spark, store)
      assert(current() == Set((1L, 1L), (3L, 3L), (101L, 101L)))
    } finally q.stop()
  }

  test("kmvIngestSink: stream-built sketches == one-pass batch sketch, redelivery no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val skDir = java.nio.file.Files.createTempDirectory("stream_kmv")
      .toString + "/sk"
    def doc(id: Long, src: String, words: Range) =
      SrcDoc(id, src, words.map(w => s"w$w").mkString(" "))
    // ≥ 8 tokens per doc (the shingle floor); overlapping word ranges
    // make cross-batch sketches share values the union must dedup
    val b1 = Seq(doc(1, "a", 1 to 20), doc(2, "b", 5 to 24))
    val b2 = Seq(doc(3, "a", 11 to 30), doc(4, "b", 5 to 24)) // doc 4 == doc 2 content
    val in = MemoryStream[SrcDoc]
    val q = Streaming.kmvIngestSink(in.toDF(), skDir).start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    // redelivery: batch 2 again — bottom-k union is idempotent
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0),
          r.getAs[scala.collection.Seq[Long]]("sk").toSeq))
        .sortBy(_._1)
    val streamed = canon(spark.read.parquet(skDir))
    val batch = canon(graft.queries.SketchQ.kmvSourceSketchesOf(
      (b1 ++ b2).toDF()))
    assert(streamed === batch)
    // non-vacuity: the cross-batch union really merged distinct values
    // (source a saw two docs with different-but-overlapping shingles)
    val aSketch = streamed.collect { case ("a", sk) => sk }.head
    val firstBatchOnly = canon(graft.queries.SketchQ.kmvSourceSketchesOf(
      b1.toDF())).collect { case ("a", sk) => sk }.head
    assert(aSketch.toSet.size > firstBatchOnly.toSet.size)
  }

  test("hllIngestSink: stream-built registers == one-pass batch sketch, redelivery no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val regs = java.nio.file.Files.createTempDirectory("stream_hll")
      .toString + "/regs"
    val b1 = Seq(
      Ev(1, 10, "click", t(0), 1.0), Ev(2, 11, "click", t(1), 1.0),
      Ev(3, 10, "view", t(2), 1.0))
    val b2 = Seq(
      // user 10 again in a LATER batch: must fold into the same register
      Ev(4, 10, "click", t(8), 1.0), Ev(5, 12, "click", t(9), 1.0))
    val in = MemoryStream[Ev]
    val q = Streaming.hllIngestSink(in.toDF(), regs).start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    // redelivery: batch 2 arrives again — register max is idempotent
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getAs[String]("event_type"),
          r.getAs[java.sql.Date]("day").toString,
          r.getAs[Array[Byte]]("regs").toSeq))
        .sortBy(x => (x._1, x._2))
    val streamed = canon(spark.read.parquet(regs))
    val batch = canon(graft.queries.SketchQ.hllDailySketchesOf(
      (b1 ++ b2).toDF()))
    assert(streamed === batch)
    // non-vacuity: the cross-batch fold really merged registers (the
    // click/day sketch has three distinct users' coordinates)
    val clickRegs = streamed.collect {
      case ("click", _, rs) => rs.count(_ > 0)
    }
    assert(clickRegs.exists(_ >= 3))
  }

  test("scd2Sink: streamed history == batch rebuild, idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = java.nio.file.Files.createTempDirectory("stream_scd2")
      .toString + "/dim"
    val b1 = Seq(Chg(1, 1, 10, 1.0), Chg(1, 2, 20, 1.0), Chg(2, 3, 15, 5.0))
    val b2 = Seq(Chg(1, 4, 30, 2.0), Chg(3, 5, 40, 7.0))
    val in = MemoryStream[Chg]
    val q = Streaming.scd2Sink(in.toDF(), state).start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    // "redelivery": batch 2 again, PLUS a stale row below user 1's open
    // version — the per-key (ts, event_id) watermark must no-op all of it
    in.addData(b2 :+ Chg(1, 1, 10, 9.0): _*); q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "value", "valid_from_s",
        "valid_to_s", "is_current").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getInt(5))).toSet
    val streamed = canon(spark.read.parquet(state))
    // the batch twin over the SAME change stream (duplicate-collapse of
    // user 1's re-stated 1.0 included) — stream must equal batch exactly
    val batch = canon(graft.ops.Scd2.build((b1 ++ b2).toDF()))
    assert(streamed == batch)
    assert(streamed == Set(
      (1L, 1L, 1.0, 10L, Some(30L), 0), // dup 1.0 at ts 20 collapsed
      (1L, 2L, 2.0, 30L, None, 1),
      (2L, 1L, 5.0, 15L, None, 1),
      (3L, 1L, 7.0, 40L, None, 1)))
  }

  test("scd2Sink: late row between a collapsed dup and its open version is dropped, not spliced") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = java.nio.file.Files.createTempDirectory("stream_scd2_late")
      .toString + "/dim"
    // ts 35 re-states 8.0 and collapses: the open version stays 8.0@30
    // but the key has OBSERVED up to (35, 5)
    val b1 = Seq(Chg(9, 4, 30, 8.0), Chg(9, 5, 35, 8.0))
    val in = MemoryStream[Chg]
    val q = Streaming.scd2Sink(in.toDF(), state).start()
    in.addData(b1: _*); q.processAllAvailable()
    // a late row at ts 32 is ABOVE the open version's valid_from but
    // BELOW what the stream already observed: a valid_from watermark
    // would splice it in as current (wrongly — the stream already saw
    // 8.0 at 35); the observation watermark must drop it
    in.addData(Chg(9, 6, 32, 3.0)); q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(state)
      .select("user_id", "version", "value", "valid_from_s",
        "valid_to_s", "is_current").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getInt(5))).toSet
    assert(got == Set((9L, 1L, 8.0, 30L, None, 1)))
  }

  test("nearDupDedupSink: streaming near-dup dedup vs the persisted index, idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream_dedup").toString
    val (corpusDir, indexDir) = (s"$root/corpus", s"$root/index")
    // 30-token base texts: a 1-word tail edit changes 1 of 28 distinct
    // 3-gram shingles => jaccard 27/29 = 0.931 >= 0.8 (a near-dup);
    // textB shares nothing with textA
    val textA = (1 to 29).map(i => s"alpha$i").mkString(" ") + " end"
    val textA2 = (1 to 29).map(i => s"alpha$i").mkString(" ") + " tail"
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val in = MemoryStream[Doc]
    val q = Streaming.nearDupDedupSink(in.toDF(), corpusDir, indexDir).start()
    // batch 1: doc 2 is a within-batch near-dup of doc 1 -> dropped
    in.addData(Doc(1, textA), Doc(2, textA2), Doc(5, textB))
    q.processAllAvailable()
    assert(spark.read.parquet(corpusDir).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
    // batch 2: doc 7 near-matches corpus doc 1 via the PERSISTED index
    // -> dropped; doc 9 is novel -> kept
    in.addData(Doc(7, textA2), Doc(9, textC))
    q.processAllAvailable()
    assert(spark.read.parquet(corpusDir).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L, 9L))
    // REDELIVERY: the same rows arrive again (foreachBatch is
    // at-least-once) — corpus and index must not change
    in.addData(Doc(7, textA2), Doc(9, textC))
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L, 9L))
    assert(corpus.count() == 3) // no duplicate rows for redelivered keys
    // the stream-built index obeys the batch persistence contract: one
    // row per (kept doc, band), usable by batch incremental dedup as-is
    val idx = spark.read.parquet(indexDir)
    assert(idx.select("doc").distinct().collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L, 9L))
    assert(idx.count() == 3 * 32)
  }

  test("nearDupDedupSink with id bloom: same state as the exact path, idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream_dedup_bloom").toString
    val (corpusDir, indexDir) = (s"$root/corpus", s"$root/index")
    val bloomPath = s"$root/ids.bloom"
    val textA = (1 to 29).map(i => s"alpha$i").mkString(" ") + " end"
    val textA2 = (1 to 29).map(i => s"alpha$i").mkString(" ") + " tail"
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val in = MemoryStream[Doc]
    val q = Streaming.nearDupDedupSink(in.toDF(), corpusDir, indexDir,
      idBloomPath = Some(bloomPath)).start()
    in.addData(Doc(1, textA), Doc(2, textA2), Doc(5, textB))
    q.processAllAvailable()
    assert(spark.read.parquet(corpusDir).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
    assert(new java.io.File(bloomPath).exists()) // the persisted filter
    // batch 2: near-match via index (doc 7 drops), novel doc 9 kept
    in.addData(Doc(7, textA2), Doc(9, textC))
    q.processAllAvailable()
    // REDELIVERY: ids 7/9 again — 9 is bloom-positive and must be caught
    // by the exact check, not re-appended
    in.addData(Doc(7, textA2), Doc(9, textC))
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L, 9L))
    assert(corpus.count() == 3)
    // the persisted bloom holds the superset invariant: every corpus id
    // is (by definition of bloom filters) reported present
    val bfIn = new java.io.FileInputStream(bloomPath)
    val bf = try org.apache.spark.util.sketch.BloomFilter.readFrom(bfIn)
      finally bfIn.close()
    assert(Seq(1L, 5L, 9L).forall(bf.mightContainLong))
  }

  test("cosineDedupSink: streaming embedding near-dup vs the persisted " +
      "cosine bucket index, idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream_cosdedup").toString
    val (corpusDir, indexDir, pairsDir) =
      (s"$root/corpus", s"$root/index", s"$root/pairs")
    val a = Array(1f, 0f, 0f, 0f)
    val a2 = Array(0.999f, 0.04f, 0f, 0f) // cosine vs a ≈ 0.9992 >= 0.9
    val b = Array(0f, 1f, 0f, 0f)
    val c = Array(0f, 0f, 1f, 0f)
    val in = MemoryStream[QVec]
    val q = Streaming.cosineDedupSink(in.toDF(), corpusDir, indexDir,
      pairsDir).start()
    // batch 1: vec 2 is a within-batch near-dup of vec 1 -> dropped
    in.addData(QVec(1, a), QVec(2, a2), QVec(5, b))
    q.processAllAvailable()
    assert(spark.read.parquet(corpusDir).select("vec_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
    // batch 2: vec 7 near-matches corpus vec 1 via the PERSISTED index
    // (the corpus is never re-bucketed) -> dropped; vec 9 novel -> kept
    in.addData(QVec(7, a2), QVec(9, c))
    q.processAllAvailable()
    assert(spark.read.parquet(corpusDir).select("vec_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L, 9L))
    // REDELIVERY: the same rows again — corpus, index and the DISTINCT
    // pair relation must not change
    in.addData(QVec(7, a2), QVec(9, c))
    q.processAllAvailable()
    q.stop()
    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L, 9L))
    assert(corpus.count() == 3) // no duplicate rows for redelivered keys
    // the stream-built index obeys the batch persistence contract: one
    // row per (kept vec, table), probe-able by batch incremental dedup
    val idx = spark.read.parquet(indexDir)
    assert(idx.select("doc").distinct().collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L, 9L))
    assert(idx.count() == 3 * 24)
    // the served pair relation: the within-batch pair and the
    // index-probe pair, nothing else (redelivered rows only re-emitted
    // duplicates of already-served pairs)
    val pairs = spark.read.parquet(pairsDir)
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 7L)))
  }

  test("cosineDedupSink: probes with the PERSISTED index's meta width and " +
      "re-sizes the index when the streamed corpus outgrows it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    val root = java.nio.file.Files.createTempDirectory("stream_cos_resize").toString
    val (corpusDir, indexDir, pairsDir) =
      (s"$root/corpus", s"$root/index", s"$root/pairs")
    def oneHot(j: Int) = Array.tabulate(8)(i => if (i == j) 1f else 0f)
    def twoHot(j: Int) = Array.tabulate(8)(i =>
      if (i == j || i == (j + 1) % 8) 0.7071f else 0f)
    // tiny widths so testdata-scale streams actually cross a boundary:
    // floor 2 bits, 8 tables
    val in = MemoryStream[QVec]
    val q = Streaming.cosineDedupSink(in.toDF(), corpusDir, indexDir,
      pairsDir, tables = 8, bitsPerTable = 2).start()
    // batch 1: 6 mutually-far vectors (max pairwise cosine 0.7071) —
    // cold start writes meta at the fallback width, then the trigger
    // immediately re-sizes to ceil(log2 6) + 2 slack = 5
    in.addData((1 to 6).map(i => QVec(i.toLong,
      if (i <= 4) oneHot(i - 1) else twoHot(2 * (i - 4)))): _*)
    q.processAllAvailable()
    val m1 = Dedup.readCosineIndexMeta(spark, indexDir).get
    assert(m1.bits == 5 && m1.tables == 8, m1.toString)
    // batch 2: 6 more far vectors -> n = 12 crosses 2^3: re-size to 6
    in.addData((11 to 16).map(i => QVec(i.toLong,
      if (i <= 14) oneHot(i - 7) else twoHot(2 * (i - 14) + 1))): _*)
    q.processAllAvailable()
    val m2 = Dedup.readCosineIndexMeta(spark, indexDir).get
    assert(m2.bits == 6, m2.toString)
    // the re-sized rows ARE a fresh full-corpus build at the new width
    // (probe parity across the re-size event: same rows -> same probes)
    val idx = spark.read.parquet(indexDir)
    val fresh = Dedup.cosineBucketIndex(spark.read.parquet(corpusDir),
      "vec_id", "embedding", tables = 8, bitsPerTable = 6)
    assert(idx.except(fresh).isEmpty && fresh.except(idx).isEmpty)
    // batch 3 probes THROUGH the re-sized index: a near-dup of vector 1
    // (ingested two re-sizes ago) is still caught and dropped
    in.addData(QVec(99L, Array(0.999f, 0.04f, 0f, 0f, 0f, 0f, 0f, 0f)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.read.parquet(pairsDir)
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 99L)), pairs.toString)
    assert(!spark.read.parquet(corpusDir).select("vec_id").collect()
      .map(_.getLong(0)).contains(99L))
  }

  test("vectorIngestSink: stream-built index serves IVF-ADC identical to batch artifacts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("stream_vec").toString
    val indexDir = s"$root/index"
    val emb = graft.Tables(spark, dir, "embeddings")
    val centroids = graft.ann.Ann.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16)
    // stream the whole corpus in two batches, redeliver the second
    val all = emb.collect().map(r => QVec(r.getLong(0),
      r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val in = MemoryStream[QVec]
    val q = Streaming.vectorIngestSink(in.toDF(), centroids, indexDir).start()
    in.addData(all.take(all.length / 2).toIndexedSeq)
    q.processAllAvailable()
    in.addData(all.drop(all.length / 2).toIndexedSeq)
    q.processAllAvailable()
    in.addData(all.drop(all.length / 2).toIndexedSeq) // REDELIVERY
    q.processAllAvailable()
    q.stop()
    val index = spark.read.parquet(indexDir)
    assert(index.count() == all.length) // converged, no duplicate rows
    // probing the STREAM-built index must equal probing batch-built
    // artifacts over the same corpus and centroids
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val queries = emb.filter(col("vec_id") < 20)
    val streamed = rows(graft.ann.Ann.ivfProbeQuantized(
      index.select(col("vec_id"), col("qv")),
      index.select(col("vec_id"), col("cluster")),
      centroids, queries, "vec_id", "embedding", "qv", k = 5, nProbe = 4))
    val batchBuilt = rows(graft.ann.Ann.ivfProbeQuantized(
      graft.ann.Quantize.codes(emb, "vec_id", "embedding"),
      graft.ann.Ann.ivfAssignments(emb, "vec_id", "embedding", centroids),
      centroids, queries, "vec_id", "embedding", "qv", k = 5, nProbe = 4))
    assert(streamed == batchBuilt)
    assert(streamed.nonEmpty)
  }

  test("vectorIngestPublishSink: re-sizes past N > headroom*nlist^2 as a " +
      "new published version; probe parity; old version stays consistent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.ops.Publish
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("stream_vec_resize")
      .toString + "/store"
    val emb = graft.Tables(spark, dir, "embeddings")
    val all = emb.collect().map(r => QVec(r.getLong(0),
      r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val in = MemoryStream[QVec]
    // floor 4 so testdata-scale streams cross a boundary: batch 1 of
    // 100 -> v1 at nlist 10 (no trigger: 100 <= 4*100); batch 2 grows
    // the corpus to 500 > 400 -> re-size to nlist 23, published as v2
    val q = Streaming.vectorIngestPublishSink(in.toDF(), root,
      nListFloor = 4).start()
    in.addData(all.take(100).toIndexedSeq)
    q.processAllAvailable()
    assert(Publish.currentVersion(spark, root).contains(1L))
    val v1 = Publish.current(spark, root)
    assert(spark.read.parquet(v1("centroids")).count() == 10)
    in.addData(all.drop(100).toIndexedSeq)
    q.processAllAvailable()
    assert(Publish.currentVersion(spark, root).contains(2L))
    val v2 = Publish.current(spark, root)
    val v2centroids = spark.read.parquet(v2("centroids"))
    assert(v2centroids.count() == 23) // ceil(sqrt 500)
    val v2index = spark.read.parquet(v2("index"))
    assert(v2index.count() == all.length)
    assert(v2index.select("cluster").distinct().collect()
      .forall(_.getInt(0) < 23))
    // REDELIVERY after the re-size: converges, publishes nothing new
    in.addData(all.drop(100).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    assert(Publish.currentVersion(spark, root).contains(2L))
    assert(spark.read.parquet(v2("index")).count() == all.length)
    // PROBE PARITY across the re-size event: the published artifacts
    // serve identically to a batch build over the same code table at
    // the same operating point (retraining is deterministic, so
    // stream-published centroids == batch-trained centroids)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val queries = emb.filter(col("vec_id") < 20)
    val served = rows(graft.ann.Ann.ivfProbeQuantized(
      v2index.select(col("vec_id"), col("qv")),
      v2index.select(col("vec_id"), col("cluster")),
      v2centroids, queries, "vec_id", "embedding", "qv", k = 5, nProbe = 5))
    val codeTable = graft.ann.Quantize.codes(emb, "vec_id", "embedding")
    val deq = codeTable.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(
        col("qv"), _.cast("double")).as("fv"))
    val batchCentroids = graft.ann.Ann.ivfCentroids(deq, "vec_id", "fv",
      nCentroids = 23)
    val batchBuilt = rows(graft.ann.Ann.ivfProbeQuantized(
      codeTable,
      graft.ann.Ann.ivfAssignments(deq, "vec_id", "fv", batchCentroids),
      batchCentroids, queries, "vec_id", "embedding", "qv",
      k = 5, nProbe = 5))
    assert(served == batchBuilt)
    assert(served.nonEmpty)
    // the OLD version a mid-stream reader resolved stays consistent:
    // its dir survives the publish (grace window), every row was
    // assigned with ITS centroids (clusters < 10), and it holds the
    // full pre-publish corpus — still probe-able at the old width
    val v1index = spark.read.parquet(v1("index"))
    assert(v1index.count() == all.length) // grew in place before v2
    assert(v1index.select("cluster").distinct().collect()
      .forall(_.getInt(0) < 10))
    val v1served = rows(graft.ann.Ann.ivfProbeQuantized(
      v1index.select(col("vec_id"), col("qv")),
      v1index.select(col("vec_id"), col("cluster")),
      spark.read.parquet(v1("centroids")), queries,
      "vec_id", "embedding", "qv", k = 5, nProbe = 4))
    assert(v1served.nonEmpty)
  }

  test("vectorIngestSink: duplicate-id batch writes ONE self-consistent row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("stream_vecdup").toString
    val emb = graft.Tables(spark, dir, "embeddings")
    val centroids = graft.ann.Ann.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16)
    // one batch, SAME id, two different payloads (producer retry after
    // an upstream update) — the regression this pins: the written row's
    // cluster and qv must derive from the SAME surviving payload, never
    // (cluster of A, codes of B)
    val a = emb.filter(col("vec_id") === 0).collect().head
      .getSeq[Float](1).toArray
    val b = emb.filter(col("vec_id") === 1).collect().head
      .getSeq[Float](1).toArray
    val in = MemoryStream[QVec]
    val q = Streaming.vectorIngestSink(in.toDF(), centroids,
      s"$root/index").start()
    in.addData(Seq(QVec(7L, a), QVec(7L, b)))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$root/index").collect()
    assert(got.length == 1)
    val (cluster, qv) =
      (got.head.getAs[Int]("cluster"), got.head.getSeq[Int](
        got.head.fieldIndex("qv")))
    // expected (cluster, qv) for each candidate payload, via the same
    // batch operators the sink composes
    def expectFor(v: Array[Float]) = {
      val one = Seq(QVec(7L, v)).toDF("vec_id", "embedding")
      (graft.ann.Ann.ivfAssignments(one, "vec_id", "embedding", centroids)
        .collect().head.getInt(1),
        graft.ann.Quantize.codes(one, "vec_id", "embedding")
          .collect().head.getSeq[Int](1))
    }
    assert(Seq(expectFor(a), expectFor(b)).contains((cluster, qv)),
      s"index row ($cluster, $qv) mixes payloads")
  }

  test("stream-built IVF index compacts without changing probe results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("stream_vec_compact").toString
    val indexDir = s"$root/index"
    val emb = graft.Tables(spark, dir, "embeddings")
    val centroids = graft.ann.Ann.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16)
    val all = emb.collect().map(r => QVec(r.getLong(0),
      r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val in = MemoryStream[QVec]
    val q = Streaming.vectorIngestSink(in.toDF(), centroids, indexDir).start()
    // five small batches: each append leaves task-sized files in every
    // touched cluster partition — the small-file problem compaction owns
    all.grouped(math.max(1, all.length / 5)).foreach { g =>
      in.addData(g.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    def parquetFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(indexDir)).filter(_.getName.endsWith(".parquet"))
    }
    val queries = emb.filter(col("vec_id") < 20)
    def probe() = {
      val index = spark.read.parquet(indexDir)
      graft.ann.Ann.ivfProbeQuantized(
        index.select(col("vec_id"), col("qv")),
        index.select(col("vec_id"), col("cluster")),
        centroids, queries, "vec_id", "embedding", "qv", k = 5, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    }
    val before = probe()
    val filesBefore = parquetFiles().size
    val rows = graft.ops.Compaction.compact(spark, indexDir,
      partitionCols = Seq("cluster"), targetRowsPerFile = 100000L)
    assert(rows == all.length.toLong)
    assert(parquetFiles().size < filesBefore,
      s"expected fewer files than $filesBefore")
    assert(probe() == before) // serving results byte-identical
  }

  test("annServeSink: stream-served quantized top-k == batch ranking, idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("stream_ann").toString
    val (codeDir, outDir) = (s"$root/codes", s"$root/served")
    // the persisted serving artifact: the whole corpus as int8 codes
    graft.ann.Quantize.codes(
      graft.Tables(spark, dir, "embeddings"), "vec_id", "embedding")
      .write.parquet(codeDir)
    // the SAME query set the batch quantized ranker uses (vec_id < 20),
    // arriving as FLOAT vectors — the sink must quantize them itself
    val queryVecs = graft.Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 20)
      .collect().map(r => QVec(r.getLong(0),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val in = MemoryStream[QVec]
    val q = Streaming.annServeSink(in.toDF(), codeDir, outDir, k = 5).start()
    in.addData(queryVecs.take(8).toIndexedSeq)
    q.processAllAvailable()
    in.addData(queryVecs.drop(8).toIndexedSeq)
    q.processAllAvailable()
    // REDELIVERY: a query batch arrives again — results must converge
    // (keyed upsert), not duplicate
    in.addData(queryVecs.take(8).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("query_id"),
      r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("cosine"))
    val served = spark.read.parquet(outDir)
    val batch = graft.queries.AnnQ.bruteTopKQuantized(spark, dir)
    assert(served.count() == batch.count()) // no duplicated redelivery rows
    assert(served.collect().map(key).toSet == batch.collect().map(key).toSet)
  }

  test("anomalyGateSink: stream flags == batch gate, idempotent under redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("stream_gate").toString
    val (momentsDir, outDir) = (s"$root/moments", s"$root/flagged")
    val events = graft.Tables(spark, dir, "events")
    // the persisted baseline: batch-trained moments over the corpus
    graft.ops.AnomalyGate.moments(events).write.parquet(momentsDir)
    // stream the SAME events in two micro-batches + one redelivery
    val rows = events
      .select("event_id", "user_id", "event_type", "ts", "value")
      .collect().map(r => Ev(r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), r.getDouble(4)))
    val in = MemoryStream[Ev]
    val q = Streaming.anomalyGateSink(in.toDF(), momentsDir, outDir).start()
    val (a, b) = rows.splitAt(rows.length / 2)
    in.addData(a.toIndexedSeq); q.processAllAvailable()
    in.addData(b.toIndexedSeq); q.processAllAvailable()
    in.addData(a.toIndexedSeq); q.processAllAvailable() // redelivery
    q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("event_id"),
      r.getAs[String]("event_type"), r.getAs[Double]("value"),
      r.getAs[Double]("z"))
    val streamed = spark.read.parquet(outDir)
    val batch = graft.queries.ProfileQ.outliers(spark, dir)
    assert(streamed.count() == batch.count()) // redelivery added nothing
    assert(streamed.collect().map(key).toSet ==
      batch.collect().map(key).toSet)
    assert(batch.count() > 0, "the corpus must have real outliers")
  }
}
