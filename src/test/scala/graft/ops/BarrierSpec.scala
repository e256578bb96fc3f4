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

  test("iterative loops are mode-invariant: star contraction + BPE " +
      "training run RELIABLE row-identical to local") {
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("barrier-iter-spec").toString)
    // star contraction: the q_dedup_clusters relation drives
    // Dedup.connectedComponents' per-round Barrier.iter chain
    def clusters() = graft.queries.DedupQ.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // BPE: the merge-round loop pins its symbol table per round
    def merges() = {
      import org.apache.spark.sql.functions._
      val words = Tables(spark, dir, "documents")
        .select(explode(graft.text.TextOps.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      graft.text.Bpe.train(words, merges = 5)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
    }
    val localClusters = withMode(Some("local"))(clusters())
    val localMerges = withMode(Some("local"))(merges())
    assert(localClusters.nonEmpty && localMerges.size == 5)
    withMode(Some("reliable")) {
      assert(clusters() == localClusters)
      assert(merges() == localMerges)
    }
  }

  test("iter in reliable mode leaves recoverable checkpoint files; " +
      "releaseIter never deletes them") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("barrier-iter-files")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    withMode(Some("reliable")) {
      val pinned = Barrier.iter(Seq(1L, 2L, 3L).toDF("x"))
      assert(pinned.count() == 3)
      Barrier.releaseIter(pinned)
      // the reliable files survive release (checkpoint-dir lifecycle
      // owns them — a restarted query may still need them) and the
      // frame stays consumable
      assert(pinned.count() == 3)
      def rddFiles(): Long = java.nio.file.Files.walk(ckpt)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(rddFiles() > 0)
    }
  }

  test("iterLazy: deferred barrier is row-identical to iter in local " +
      "and reliable modes, truncates lineage, and releases cleanly") {
    import org.apache.spark.sql.functions._
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("barrier-lazy-spec").toString)
    def build() = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("n"))
      .filter(col("doc_id") % 2 === 0)
    val expected = withMode(Some("local"))(Barrier.iter(build())).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(expected.nonEmpty)
    for (mode <- Seq("local", "reliable")) withMode(Some(mode)) {
      val lazyFrame = Barrier.iterLazy(build())
      // the first action materializes; rows match the eager barrier
      val got = lazyFrame.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected, s"mode=$mode")
      // lineage is truncated exactly as iter's (plan root is the
      // checkpointed LogicalRDD, so releaseIter accepts the frame)
      assert(lazyFrame.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
      Barrier.releaseIter(lazyFrame)
    }
    // the incremental-BPE usage shape: consume via an aggregation that
    // covers every partition, then keep reading the materialized frame
    withMode(Some("local")) {
      val frame = Barrier.iterLazy(build())
      assert(frame.agg(count(lit(1))).collect()(0).getLong(0) ==
        expected.size.toLong)
      assert(frame.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
        expected)
      Barrier.releaseIter(frame)
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
