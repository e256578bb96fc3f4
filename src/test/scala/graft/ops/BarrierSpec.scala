package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec

/** The barrier-mode contract: `local`, `replicated` and `reliable` are
  * the SAME materialization semantics (eager, row-identical) with
  * different fault-tolerance cost — so flipping the config on a cluster
  * can never change results, only survivability.
  */
class BarrierSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withMode[A](mode: Option[String])(f: => A): A = {
    val key = "spark.graft.barrier.mode"
    val prev = spark.conf.getOption(key)
    mode match {
      case Some(m) => spark.conf.set(key, m)
      case None => spark.conf.unset(key)
    }
    try f
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("all three modes materialize row-identical frames") {
    import org.apache.spark.sql.functions._
    def build() = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("n"))
      .filter(col("doc_id") % 3 === 0)
    val expected = build().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(expected.nonEmpty)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("barrier-spec").toString)
    for (mode <- Seq(None, Some("local"), Some("replicated"), Some("reliable"))) {
      val got = withMode(mode)(Barrier.once(build())).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected, s"mode=$mode")
    }
  }

  test("a real hot path is mode-invariant: image phash pairs local == replicated") {
    def pairs() = graft.queries.MultimodalQ.imagePhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val local = withMode(Some("local"))(pairs())
    assert(local.nonEmpty)
    assert(withMode(Some("replicated"))(pairs()) == local)
  }

  test("release frees the once-materialized frame in local and replicated modes") {
    import org.apache.spark.sql.functions._
    def build() = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("n"))
    for (mode <- Seq("local", "replicated")) withMode(Some(mode)) {
      val frame = Barrier.once(build())
      val n = frame.count()
      assert(n > 0, s"mode=$mode")
      Barrier.release(frame)
      // released storage must not change results for a NEW build (the
      // operator contract: release is a resource hint, never semantic)
      assert(build().count() == n, s"mode=$mode")
    }
    // a consume-after-release in replicated mode recomputes via kept
    // lineage rather than failing — the cluster-survivability property
    withMode(Some("replicated")) {
      val frame = Barrier.once(build())
      Barrier.release(frame)
      assert(frame.count() > 0)
    }
  }

  test("unknown mode is a loud config error, not a silent fallback") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val e = intercept[IllegalArgumentException] {
      withMode(Some("asynchronous"))(Barrier.once(df))
    }
    assert(e.getMessage.contains("asynchronous"))
  }
}
