package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution probe (r17, judge ask #3): runs ONE
  * registry member under the bench sink with a listener that sums the
  * per-stage executor metrics the wall time decomposes into —
  * `runMain graft.StageProbe <sfDir> <member> [runs]`.
  *
  * Per run it prints one JSON line with wall plus, summed over stages:
  * executorRunTime, executorCpuTime, jvmGcTime, shuffle read/write
  * bytes, shuffleFetchWaitTime, shuffleWriteTime, executor
  * deserialize time, memory/disk spill bytes. The point: when a member
  * swings across sessions with the code pinned flat, the component
  * that co-swings with the wall NAMES the mechanism — cpu flat + run
  * up = off-core stalls (bandwidth); gc up = heap pressure; fetch-wait
  * up = shuffle service; spill up = memory floor. Interleave with
  * [[HostProbe]] draws to correlate against the DRAM floor directly.
  */
object StageProbe {

  private class Agg extends SparkListener {
    var runMs, cpuMs, gcMs, deserMs, shufWriteMs, fetchWaitMs = 0L
    var shufReadB, shufWriteB, spillMemB, spillDiskB, inputB = 0L
    var tasks = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        runMs += m.executorRunTime
        cpuMs += m.executorCpuTime / 1000000L
        gcMs += m.jvmGCTime
        deserMs += m.executorDeserializeTime
        shufWriteMs += m.shuffleWriteMetrics.writeTime / 1000000L
        fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        shufReadB += m.shuffleReadMetrics.totalBytesRead
        shufWriteB += m.shuffleWriteMetrics.bytesWritten
        spillMemB += m.memoryBytesSpilled
        spillDiskB += m.diskBytesSpilled
        inputB += m.inputMetrics.bytesRead
        tasks += sc.stageInfo.numTasks
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val member = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(member)
    val out = new StringBuilder
    (1 to runs).foreach { i =>
      System.gc()
      val agg = new Agg
      spark.sparkContext.addSparkListener(agg)
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; wait for the queue so the
      // last stages of THIS run are attributed to it
      org.apache.spark.graft.ListenerBridge
        .waitUntilEmpty(spark.sparkContext, 30000)
      spark.sparkContext.removeSparkListener(agg)
      val line = String.format(java.util.Locale.ROOT,
        """{"member":"%s","run":%d,"wall_s":%.3f,"run_s":%.1f,""" +
          """"cpu_s":%.1f,"gc_s":%.2f,"deser_s":%.2f,""" +
          """"shuf_write_s":%.2f,"fetch_wait_s":%.2f,""" +
          """"shuf_read_mb":%.1f,"shuf_write_mb":%.1f,""" +
          """"spill_mem_mb":%.1f,"spill_disk_mb":%.1f,""" +
          """"input_mb":%.1f,"tasks":%d}""",
        member, Integer.valueOf(i), Double.box(wall),
        Double.box(agg.runMs / 1e3), Double.box(agg.cpuMs / 1e3),
        Double.box(agg.gcMs / 1e3), Double.box(agg.deserMs / 1e3),
        Double.box(agg.shufWriteMs / 1e3), Double.box(agg.fetchWaitMs / 1e3),
        Double.box(agg.shufReadB / 1e6), Double.box(agg.shufWriteB / 1e6),
        Double.box(agg.spillMemB / 1e6), Double.box(agg.spillDiskB / 1e6),
        Double.box(agg.inputB / 1e6), java.lang.Long.valueOf(agg.tasks))
      println(line)
      out.append(line).append('\n')
    }
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
      val path = java.nio.file.Paths.get(p)
      Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(path, out.toString)
    }
    spark.stop()
  }
}
