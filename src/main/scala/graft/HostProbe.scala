package graft

/** Host memory-bandwidth floor probe (r17, judge ask #3): a pinned
  * ~5 s multithreaded stream copy over buffers far larger than L3,
  * reporting aggregate GB/s. Run BEFORE and BETWEEN bench draws.
  *
  * Why it exists: the sf10 text-shingle members (q_minhash_lsh,
  * q_incremental_dedup) swing 20–47 s across sessions with the code
  * pinned flat by interleaved A/Bs — the suspicion is a host
  * memory-bandwidth floor that narrow-CPU canaries cannot see (they
  * read BETTER in the same sessions the shuffle members read +40%).
  * This probe measures that floor directly: shuffle-heavy members are
  * bandwidth-bound (row serialization in, sort buffers through, spill
  * out), so if their wall co-swings with this number across sessions
  * while CPU-bound members hold, the mechanism is named.
  *
  * Output: one JSON line {"metric":"host_floor","bw_gbps":…,
  * "threads":…,"secs":…} on stdout (and to SPARK_GRAFT_PROBE_OUT if
  * set). No Spark session — the probe must cost nothing and perturb
  * nothing.
  */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val threads = sys.env.get("SPARK_GRAFT_PROBE_THREADS")
      .map(_.toInt).getOrElse(
        math.max(4, Runtime.getRuntime.availableProcessors() / 2))
    val secs = sys.env.get("SPARK_GRAFT_PROBE_SECS")
      .map(_.toDouble).getOrElse(5.0)
    // 64 MiB of longs per thread per side — far beyond L3 on any box
    // this runs on, so the copy streams from DRAM, not cache
    val words = 8 * 1024 * 1024
    val totalBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ready = new java.util.concurrent.CountDownLatch(threads)
    val go = new java.util.concurrent.CountDownLatch(1)
    val pool = (0 until threads).map { t =>
      val th = new Thread(() => {
        val src = new Array[Long](words)
        val dst = new Array[Long](words)
        var i = 0
        while (i < words) { src(i) = i * 2654435761L + t; i += 1 }
        ready.countDown()
        go.await()
        var local = 0L
        while (!stop.get()) {
          System.arraycopy(src, 0, dst, 0, words)
          // touch dst so the copy cannot be elided, and alternate
          // direction so both arrays stream both ways
          src(0) = dst(words - 1)
          System.arraycopy(dst, 0, src, 0, words)
          local += 4L * words * 8 // 2 copies x read+write
        }
        totalBytes.addAndGet(local)
      })
      th.setDaemon(true)
      th.start()
      th
    }
    ready.await()
    val t0 = System.nanoTime()
    go.countDown()
    Thread.sleep((secs * 1000).toLong)
    stop.set(true)
    pool.foreach(_.join(10000))
    val wall = (System.nanoTime() - t0) / 1e9
    val gbps = totalBytes.get() / wall / 1e9
    val line = String.format(java.util.Locale.ROOT,
      """{"metric":"host_floor","bw_gbps":%.2f,"threads":%d,"secs":%.2f}""",
      Double.box(gbps), Integer.valueOf(threads), Double.box(wall))
    println(line)
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
      val path = java.nio.file.Paths.get(p)
      Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(path, line + "\n")
    }
  }
}
