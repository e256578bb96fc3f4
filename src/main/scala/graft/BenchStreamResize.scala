package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-level (encoder requirement) streamed-vector record. */
case class ResizeVec(vec_id: Long, embedding: Array[Float])

/** Streamed-index re-size under CONCURRENT readers (r16, judge ask #7):
  * drive [[graft.streaming.Streaming.vectorIngestPublishSink]] across
  * TWO re-size triggers at sf1 scale while a reader PINNED to the first
  * published version keeps probing it, and measure
  *
  *  - probe latency across the re-size event (the pinned version must
  *    serve flat through a publish: its dir is immutable and retained),
  *  - the re-size batches' wall time vs plain append batches,
  *  - the grace-window GC: the pinned v1 must survive the v2 publish
  *    (two most recent retained) and become unreadable only after v3 —
  *    the reader records WHEN its probes start failing.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> java ... graft.BenchStreamResize
  * (defaults sized for the 20k-vector sf1 embeddings table: cold batch
  * 300 → v1 nlist 18; crossing 4·18²=1296 → v2 nlist 45; crossing
  * 4·45²=8100 → v3 nlist ⌈√N⌉ — both re-sizes inside one stream).
  */
object BenchStreamResize {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/bench_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b: SparkSession.Builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emb = Tables(spark, sfDir, "embeddings")
    val all = emb.orderBy(col("vec_id")).collect().map(r => ResizeVec(
      r.getLong(0), r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val queries = emb.filter(col("vec_id") < 20).localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("bench_resize")
      .toString + "/store"

    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[ResizeVec]
    val q = graft.streaming.Streaming
      .vectorIngestPublishSink(in.toDF(), root).start()

    // cold batch → v1
    in.addData(all.take(300).toIndexedSeq)
    q.processAllAvailable()
    val v1 = graft.ops.Publish.current(spark, root)
    val v1n = spark.read.parquet(v1("centroids")).count()

    // pinned reader: resolves v1 ONCE, probes until it disappears
    @volatile var stopReader = false
    val probeLog = new java.util.concurrent.ConcurrentLinkedQueue[
      (Double, Double, Boolean)]() // (t_since_start, wall, ok)
    val tStart = System.nanoTime()
    def now(): Double = (System.nanoTime() - tStart) / 1e9
    val reader = new Thread(() => {
      val idx = spark.read.parquet(v1("index"))
      val cen = spark.read.parquet(v1("centroids"))
      while (!stopReader) {
        val t0 = now()
        val ok =
          try {
            graft.ann.Ann.ivfProbeQuantized(
              idx.select(col("vec_id"), col("qv")),
              idx.select(col("vec_id"), col("cluster")),
              cen, queries, "vec_id", "embedding", "qv",
              k = 5, nProbe = 4).count() > 0
          } catch { case _: Throwable => false }
        probeLog.add((t0, now() - t0, ok))
        Thread.sleep(50)
      }
    })
    reader.setDaemon(true)
    reader.start()

    // ingest in 1k batches; record per-batch wall + version after
    val batchLog = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Double, Long)] // (corpusN, wall, version)
    var fed = 300
    while (fed < all.length) {
      val next = math.min(fed + 1000, all.length)
      in.addData(all.slice(fed, next).toIndexedSeq)
      val t0 = now()
      q.processAllAvailable()
      val v = graft.ops.Publish.currentVersion(spark, root).getOrElse(-1L)
      batchLog += ((next, now() - t0, v))
      fed = next
    }
    // let the reader observe the post-v3 world, then stop
    Thread.sleep(2000)
    stopReader = true
    reader.join(10000)
    q.stop()

    val probes = probeLog.toArray(Array.empty[(Double, Double, Boolean)])
    val publishes = batchLog.zip(batchLog.drop(1)).collect {
      case ((_, _, va), (n, w, vb)) if vb > va => (n, w, vb)
    }
    val v2At = batchLog.find(_._3 >= 2L).map(_._1).getOrElse(-1)
    val v3At = batchLog.find(_._3 >= 3L).map(_._1).getOrElse(-1)
    // probe medians before/after the first re-size publish (v2)
    val v2Time = batchLog.takeWhile(_._3 < 2L).size // index boundary
    val tV2 = if (batchLog.exists(_._3 >= 2L))
      batchLog.take(v2Time + 1).map(_._2).sum else Double.MaxValue
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1 else xs.sorted.apply(xs.size / 2)
    val okProbes = probes.filter(_._3)
    val failProbes = probes.filter(!_._3)
    val firstFail = failProbes.headOption.map(_._1).getOrElse(-1.0)
    val lastOk = okProbes.lastOption.map(_._1).getOrElse(-1.0)
    def f2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val preMed = median(okProbes.filter(_._1 < tV2).map(_._2).toSeq)
    val postMed = median(okProbes.filter(_._1 >= tV2).map(_._2).toSeq)
    val appendWalls = batchLog.zip(0L +: batchLog.map(_._3))
      .collect { case ((_, w, va), vb) if va == vb => w }
    val resizeWalls = publishes.map(_._2)
    val finalVers = graft.ops.Publish.currentVersion(spark, root)
    val v1Gone = !new java.io.File(new java.net.URI(
      new org.apache.hadoop.fs.Path(v1("index")).getParent.toUri.toString)
      .getPath).exists()
    val json =
      s"""{"metric":"stream_resize_readers","unit":"sec",""" +
        s""""sf":${Json.str(sfDir)},"corpus":${all.length},""" +
        s""""v1_nlist":$v1n,"v2_at_n":$v2At,"v3_at_n":$v3At,""" +
        s""""final_version":${finalVers.getOrElse(-1L)},""" +
        s""""append_batch_median":${f2(median(appendWalls.toSeq))},""" +
        s""""resize_batch_walls":[${resizeWalls.map(f2).mkString(",")}],""" +
        s""""probe_n":${probes.length},"probe_ok":${okProbes.length},""" +
        s""""probe_median_pre_resize":${f2(preMed)},""" +
        s""""probe_median_post_resize":${f2(postMed)},""" +
        s""""first_probe_fail_t":${f2(firstFail)},""" +
        s""""last_probe_ok_t":${f2(lastOk)},""" +
        s""""v1_dir_gone":$v1Gone}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
