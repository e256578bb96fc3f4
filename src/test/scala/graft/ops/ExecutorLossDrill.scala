package graft.ops

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The EXECUTOR-LOSS drill child process — the experiment behind the
  * [[Barrier]] fault-tolerance claims. Runs on a REAL multi-JVM
  * mini-cluster (`local-cluster[2,2,1024]`: one driver, two executor
  * JVMs supervised by an in-process standalone master/worker — the
  * closest thing to a cluster a single box offers), so "executor loss"
  * means an actual JVM halt with its block-manager state gone, not a
  * simulation.
  *
  * Protocol (one mode per process — a context that just lost an
  * executor must not leak state into the next mode's measurement):
  *
  *  1. materialize a frame through [[Barrier.once]] under `args(0)`
  *     (local | replicated | reliable), spread across both executors —
  *     or through the per-round [[Barrier.iter]] when `args(0)` is
  *     `iter-local` / `iter-reliable` (the loop-state pin the star
  *     contraction, BPE and PQ training rounds hold);
  *  2. HALT one executor JVM (`Runtime.halt` inside a task pinned to
  *     the victim by executor id — the worker will respawn a fresh,
  *     EMPTY executor, exactly like a cluster manager would);
  *  3. consume the barriered frame again and report:
  *     `DRILL <mode> SURVIVED <sum>` or `DRILL <mode> DIED <cause>`.
  *
  * Expected (ExecutorLossDrillSpec asserts it): `local` DIES — a
  * localCheckpoint's blocks live only on the executors that computed
  * them and its lineage is truncated, so the loss is unrecoverable;
  * `replicated` SURVIVES on the second replica; `reliable` SURVIVES
  * from checkpoint files. This is why `local` is the single-JVM
  * default and the cluster modes exist.
  */
object ExecutorLossDrill {

  /** The JDK-17 module opens Spark needs in every JVM it launches
    * outside spark-submit — the executor JVMs here are spawned by the
    * in-process standalone worker, which forwards these via
    * `spark.executor.extraJavaOptions`. Mirrors build.sbt's list.
    */
  val Jdk17Opens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    // "local" | "replicated" | "reliable" drill Barrier.once;
    // "iter-local" | "iter-reliable" drill the per-round Barrier.iter
    // (the iterative-loop state the star contraction / BPE / PQ loops
    // pin each round)
    val spec = args(0)
    val useIter = spec.startsWith("iter-")
    val mode = spec.stripPrefix("iter-")
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName(s"graft-executor-loss-$spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.barrier.mode", mode)
      // the executors are fresh JVMs launched by the worker: they need
      // the repo classes (this object runs inside their tasks) and the
      // JDK17 module opens the driver JVM got from sbt
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", Jdk17Opens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory(s"drill-ckpt-$mode").toString)
    try {
      // wait for both executors to register, then learn their ids
      val ids = waitForTwoExecutors(spark)
      // a frame with partitions computed ON BOTH executors: shuffle into
      // 4 partitions, each row tagged by the executor that produced it
      import spark.implicits._
      val base = spark.range(0, 10000, 1, 4).toDF("id")
        .repartition(4, col("id"))
        .select(col("id"), (col("id") * 3 + 1).as("y"))
      val frame = if (useIter) Barrier.iter(base) else Barrier.once(base)
      val expected = frame.agg(sum(col("y"))).head().getLong(0)
      // the victim: the executor holding at least one of the frame's
      // partitions (any of the two — both hold some of 4 partitions)
      val victim = ids.min
      halt(spark, victim)
      waitForRespawn(spark, victim)
      val got =
        try Right(frame.agg(sum(col("y"))).head().getLong(0))
        catch { case e: Throwable => Left(rootCause(e).getClass.getSimpleName) }
      got match {
        case Right(s) if s == expected => println(s"DRILL $spec SURVIVED $s")
        case Right(s) => println(s"DRILL $spec WRONG $s != $expected")
        case Left(c) => println(s"DRILL $spec DIED $c")
      }
    } finally spark.stop()
  }

  /** Block until the standalone backend has 2 registered executors and
    * return their ids (driver excluded).
    */
  private def waitForTwoExecutors(spark: SparkSession): Seq[String] = {
    val sc = spark.sparkContext
    val deadline = System.nanoTime() + 120e9.toLong
    while (System.nanoTime() < deadline) {
      val ids = sc.getExecutorMemoryStatus.keys.toSeq
        .filterNot(_.startsWith("driver"))
      val live = sc.parallelize(1 to 64, 8)
        .map(_ => SparkEnv.get.executorId).distinct().collect().toSeq
      if (ids.size >= 2 && live.size >= 2) return live.sorted
      Thread.sleep(500)
    }
    throw new IllegalStateException("drill: two executors never registered")
  }

  /** Kill `victim` with an unconditional JVM halt from inside a task.
    * The task set itself completes: tasks on the victim die with it and
    * retry on the survivor, where the guard is false.
    */
  private def halt(spark: SparkSession, victim: String): Unit = {
    try spark.sparkContext.parallelize(1 to 64, 16).foreach { _ =>
      if (SparkEnv.get.executorId == victim) {
        // flush nothing, run no shutdown hooks: a real OOM-kill/SIGKILL
        Runtime.getRuntime.halt(137)
      }
    } catch {
      case _: org.apache.spark.SparkException =>
        // the killing job may itself observe the executor loss; the
        // halt has happened either way, which is all the drill needs
    }
  }

  /** Wait until the worker has respawned the victim (a NEW executor id
    * registers and runs tasks) so the post-loss consume measures block
    * loss, not scheduler starvation.
    */
  private def waitForRespawn(spark: SparkSession, victim: String): Unit = {
    val sc = spark.sparkContext
    val deadline = System.nanoTime() + 120e9.toLong
    while (System.nanoTime() < deadline) {
      val live =
        try sc.parallelize(1 to 64, 8)
          .map(_ => SparkEnv.get.executorId).distinct().collect().toSeq
        catch { case _: org.apache.spark.SparkException => Seq.empty }
      if (live.size >= 2 || (live.nonEmpty && !live.contains(victim))) return
      Thread.sleep(500)
    }
  }

  private def rootCause(e: Throwable): Throwable =
    if (e.getCause == null || e.getCause == e) e else rootCause(e.getCause)
}
