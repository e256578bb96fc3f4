package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** The dedup pruning/recall ledger's exact-baseline SAMPLING contract
  * (r15): under [[DedupQ.ExactSampleCap]] items the exact columns audit
  * the full pair space (coverage 1.0 — every oracled SF); above it they
  * audit a deterministic fixed-cost item sample, and the report says so
  * through exact_items/exact_coverage instead of silently carrying the
  * Θ(N²) term the other columns exist to avoid.
  */
class PruningReportSpec extends AnyFunSuite with SparkSpec {

  test("q_dedup_pruning_report at sf0.01: coverage 1.0, recall == the " +
      "full-relation recall, simhash row is the recall-1.0 witness") {
    val rows = DedupQ.dedupPruningReport(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("image_png", "image_jpeg", "audio", "video",
      "simhash_fixture"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("exact_items") == r.getAs[Long]("n_items"))
      assert(r.getAs[Double]("exact_coverage") == 1.0)
      // full coverage ⇒ the in-scope numerator IS the verified count
      assert(r.getAs[Long]("n_pairs_exact_scope") == r.getAs[Long]("n_pairs"))
    }
    assert(rows("simhash_fixture").getAs[Double]("recall") == 1.0)
  }

  /** Mixed 128-bit fingerprints over ids 0..n-1: ids 2k and 2k+1 differ
    * in exactly lo bit 0 (hamming 1 — a true near-dup pair); cross
    * fingerprints are multiplicative mixes, pairwise hamming ~64.
    */
  private def consecutiveTwinHashes(n: Long) = {
    import spark.implicits._
    (0L until n).map { i =>
      val p = i / 2
      (i, p * 0x9E3779B97F4A7C15L,
        (p + 1L) * 0x2545F4914F6CDD1DL ^ (i % 2))
    }.toDF("asset_id", "phash_hi", "phash_lo").localCheckpoint()
  }

  test("bandedPruningRow past the cap: exact columns audit the " +
      "deterministic sample at fixed cost, recall is measured inside it") {
    // ids 0..2499 twin with 30000..32499 (offset divisible by the d=3
    // stride, so planted pairs CAN co-sample); n = 5000 -> d = 3
    val n = 5000L
    val ids = (0L until 2500L) ++ (30000L until 32500L)
    val hashes = {
      import spark.implicits._
      ids.map { i =>
        val p = if (i >= 30000L) i - 30000L else i
        val near = if (i >= 30000L) 1L else 0L
        (i, p * 0x9E3779B97F4A7C15L,
          (p + 1L) * 0x2545F4914F6CDD1DL ^ near)
      }.toDF("asset_id", "phash_hi", "phash_lo").localCheckpoint()
    }
    val row = DedupQ.bandedPruningRow("synthetic", hashes).collect()(0)
    val d = (n + DedupQ.ExactSampleCap - 1) / DedupQ.ExactSampleCap
    assert(d == 3)
    def sampled(i: Long) = (i * 1000003L + 12345L) % d == 0
    val sampledIds = ids.filter(sampled)
    assert(row.getAs[Long]("n_items") == n)
    assert(row.getAs[Long]("exact_items") == sampledIds.size.toLong)
    val m = sampledIds.size.toDouble
    val expCoverage = m * (m - 1) / (n.toDouble * (n - 1))
    assert(math.abs(row.getAs[Double]("exact_coverage") - expCoverage) < 1e-12)
    // the exact column costs |sample|²/2, not N²/2 — and it counts
    // exactly the true pairs with BOTH endpoints sampled
    val trueInSample = (0L until 2500L)
      .count(p => sampled(p) && sampled(p + 30000L)).toLong
    assert(trueInSample > 0) // the recall estimate is non-vacuous here
    assert(row.getAs[Long]("n_exact") == trueInSample)
    assert(row.getAs[Long]("n_pairs_exact_scope") == trueInSample)
    // banding catches every hamming-1 pair (they share 3 of 4 bands):
    // the full verified count is all n/2 planted pairs
    assert(row.getAs[Long]("n_pairs") == n / 2)
    assert(row.getAs[Double]("recall") == 1.0)
  }

  test("bandedPruningRow: an exact scope holding NO pair yields NULL " +
      "recall, not an ANSI division crash") {
    // consecutive-id twins (2k, 2k+1) with d = 3: two consecutive ids
    // are never both ≡ 0 (mod 3), so the sampled scope holds no pair
    val row = DedupQ.bandedPruningRow("synthetic",
      consecutiveTwinHashes(5000L)).collect()(0)
    assert(row.getAs[Long]("n_exact") == 0L)
    assert(row.getAs[Long]("n_pairs_exact_scope") == 0L)
    assert(row.isNullAt(row.fieldIndex("recall")))
    assert(row.getAs[Long]("n_pairs") == 2500L) // the full audit still ran
  }
}
