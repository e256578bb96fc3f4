package graft.etl

import java.nio.file.{Files, Paths}

import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Perf/scale drill (validation_perf_scale_dag.py:37-86) + C5
  * fan-out/fan-in.
  */
class ValidationDrillSpec extends AnyFunSuite with SparkSpec {

  private def tmpBase(): String =
    Files.createTempDirectory("drill").toString

  test("fan-out runs N concurrent Spark jobs and fan-in preserves order") {
    val oks = ValidationDrill.fanOutFanIn(spark, tasks = 6)
    assert(oks == (0 until 6).map(i => s"ok:$i"))
  }

  test("drill: artifact committed atomically, deterministic failure names it, failure event written") {
    val base = tmpBase()
    val e = intercept[ValidationDrill.DrillError] {
      ValidationDrill.run(spark, base, "run-drill", tasks = 6, rows = 500)
    }
    // the failure must reference the artifact path (evidence-pack contract)
    assert(e.getMessage.contains("artifact="))
    val path = ValidationDrill.artifactPath(base, "run-drill")
    assert(e.getMessage.contains(path))
    // artifact is fully committed (atomic rename: no .tmp left behind)
    assert(Files.exists(Paths.get(path)))
    assert(!Files.exists(Paths.get(path + ".tmp")))
    // and parses as the declared shape with all rows present
    val parsed = spark.read.option("multiLine", true).json(path)
    assert(parsed.selectExpr("size(rows)").head().getInt(0) == 500)
    assert(parsed.selectExpr("schema_version").head().getLong(0) == 1L)
    // K8: the failure event landed
    val events = Files.list(Paths.get(s"$base/failure_events")).toArray
    assert(events.length == 1)
    val ev = new String(Files.readAllBytes(
      Paths.get(events(0).toString)), java.nio.charset.StandardCharsets.UTF_8)
    assert(ev.contains("validation_perf_scale") && ev.contains("aggregate_and_fail"))
  }
}
