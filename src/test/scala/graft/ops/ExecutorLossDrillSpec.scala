package graft.ops

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** The EXPERIMENT behind the [[Barrier]] fault-tolerance table: each
  * barrier mode runs in its own child JVM on a REAL two-executor
  * mini-cluster (`local-cluster[2,2,1024]` — separate executor JVMs
  * under an in-process standalone master/worker), one executor is
  * HALTED after the barrier materializes, and the barriered frame is
  * consumed again ([[ExecutorLossDrill]] is the child). Expected, and
  * asserted:
  *
  *  - `local` (localCheckpoint) DIES — blocks lived only on the lost
  *    executor and lineage is truncated, so the loss is unrecoverable;
  *  - `replicated` (MEMORY_AND_DISK_2) SURVIVES on the second replica;
  *  - `reliable` (checkpoint files) SURVIVES from disk.
  *
  * One process per mode: a context that just lost an executor must not
  * leak scheduler/blockmanager state into the next mode's measurement,
  * and the shared local[4] test session can't host a second context in
  * this JVM anyway.
  *
  * Environment contract: needs a Spark distribution at SPARK_HOME (or
  * /opt/spark) for the worker's executor-launch scripts. If the
  * sandbox can't spawn the mini-cluster at all (executors never
  * register), the spec CANCELS — loudly — rather than passing
  * vacuously or failing on an environment limitation.
  */
class ExecutorLossDrillSpec extends AnyFunSuite {

  private def runDrill(mode: String): (String, String) = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(s"$sparkHome/jars").isDirectory,
      s"SKIPPED LOUDLY: no Spark distribution at $sparkHome — " +
        "the executor-loss drill needs one to spawn worker JVMs")
    val cmd: Seq[String] =
      Seq(javaBin) ++ ExecutorLossDrill.Jdk17Opens.split(" ").toSeq ++ Seq(
        "-Dspark.ui.enabled=false", "-Xmx2g",
        "-cp", sys.props("java.class.path"),
        "graft.ops.ExecutorLossDrill", mode)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome)
    // a bare binary distribution has no assembly build dirs — the
    // in-process command builder needs the scala version pinned
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val finished = p.waitFor(300, TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    val line = out.linesIterator.find(_.startsWith(s"DRILL $mode"))
      .getOrElse("")
    (line, out)
  }

  private def verdictOf(mode: String): String = {
    val (line, out) = runDrill(mode)
    if (line.isEmpty) {
      val envFailure = out.contains("two executors never registered") ||
        out.contains("Cannot find any build directories")
      assume(!envFailure,
        s"SKIPPED LOUDLY: the sandbox could not spawn the " +
          s"local-cluster mini-cluster for mode=$mode — drill output " +
          s"tail: ${out.takeRight(600)}")
      fail(s"drill child for mode=$mode produced no DRILL line; " +
        s"output tail: ${out.takeRight(600)}")
    }
    line.split(" ")(2)
  }

  test("local barrier DIES on executor loss (localCheckpoint blocks " +
      "are unrecoverable on a cluster)") {
    assert(verdictOf("local") == "DIED")
  }

  test("replicated barrier SURVIVES executor loss on the second replica") {
    assert(verdictOf("replicated") == "SURVIVED")
  }

  test("reliable barrier SURVIVES executor loss from checkpoint files") {
    assert(verdictOf("reliable") == "SURVIVED")
  }

  test("ITERATIVE loop state (Barrier.iter): local dies, reliable " +
      "survives — the per-round pin is cluster-recoverable") {
    assert(verdictOf("iter-local") == "DIED")
    assert(verdictOf("iter-reliable") == "SURVIVED")
  }
}
