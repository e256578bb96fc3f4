package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Product-quantization contract:
  *  - codebook/code-table shapes and ranges;
  *  - ADC scoring is EXACTLY dot(query, reconstruction) — the lookup
  *    table introduces no approximation beyond quantization itself;
  *  - recall@5 vs the exact float ranking clears a floor;
  *  - the whole path is deterministic run to run.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val M = 16
  private val K = 32

  private lazy val corpus = graft.Tables(spark, dir, "embeddings")
  private lazy val codebooks =
    Pq.fitCodebooks(corpus, "vec_id", "embedding", m = M, k = K,
      iterations = 3).cache()
  private lazy val codes =
    Pq.encode(corpus, "vec_id", "embedding", codebooks).cache()

  test("codebook shape: m*k rows, centroids of dim/m doubles") {
    val rows = codebooks.collect()
    assert(rows.length == M * K)
    assert(rows.forall(_.getSeq[Double](2).size == 64 / M))
    val cells = rows.map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(cells == (for (s <- 0 until M; c <- 0 until K) yield (s, c)).toSet)
  }

  test("code table: m codes per vector, each in [0, k)") {
    val rows = codes.collect()
    assert(rows.length == corpus.count().toInt)
    assert(rows.forall(_.getSeq[Int](1).size == M))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < K)))
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("ADC cosine == cosine(query, reconstruction) recomputed in Scala") {
    val books = codebooks.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codeMap = codes.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getDouble(2))).toMap
    val vecs = corpus.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val queries = corpus.filter(col("vec_id") < 5)
    val got = Pq.adcTopK(codes, codebooks, queries, "vec_id", "embedding",
      kNeighbors = 5).collect()
    assert(got.length == 25)
    for (r <- got) {
      val (qid, nid, cos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val vq = vecs(qid)
      val recon = (0 until M).flatMap(s => books((s, codeMap(nid)._1(s))))
      val dot = recon.zip(vq).map { case (a, b) => a * b }.sum
      val expect = dot /
        (math.sqrt(recon.map(x => x * x).sum) *
          math.sqrt(vq.map(x => x * x).sum))
      assert(math.abs(cos - expect) < 1e-6, s"($qid, $nid)")
      // rnorm stored at encode time IS the reconstruction norm
      assert(math.abs(codeMap(nid)._2 -
        math.sqrt(recon.map(x => x * x).sum)) < 1e-9)
    }
  }

  test("recall@5 vs exact float ranking clears the floor") {
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val pq = Pq.adcTopK(codes, codebooks, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).map(_._2).toSet
      val p = pq.getOrElse(q, Array.empty).map(_._2).toSet
      (e intersect p).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    // 64-dim weakly-clustered corpus at 32x compression: the bar is that
    // PQ beats random (5/N ~ 0.1) by a wide margin, not float parity
    assert(mean >= 0.35, s"mean recall@5 $mean")
  }

  test("zero-norm query ranks real neighbors' cosine 0, never NaN-first") {
    import spark.implicits._
    // corpus of real vectors + one all-zero query: every cosine for the
    // zero query is DEFINED as 0 (no direction), so ranking falls back
    // to the neighbor_id tiebreak instead of NaN flooding the top-k
    val base = corpus.limit(10)
    val zero = Seq((999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val got = Pq.adcTopK(codes, codebooks, zero, "vec_id", "embedding", 3)
      .collect()
    assert(got.length == 3)
    assert(got.forall(r => !r.getDouble(3).isNaN))
    assert(got.forall(_.getDouble(3) == 0.0))
    // tiebreak: ascending neighbor ids
    assert(got.map(_.getLong(2)).toSeq == got.map(_.getLong(2)).toSeq.sorted)
    assert(base.count() == 10) // corpus untouched
  }

  test("deterministic run to run (fresh frames, no cache)") {
    def run() = {
      val cb = Pq.fitCodebooks(corpus, "vec_id", "embedding", m = M, k = K,
        iterations = 3)
      val ct = Pq.encode(corpus, "vec_id", "embedding", cb)
      Pq.adcTopK(ct, cb, corpus.filter(col("vec_id") < 5),
        "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    }
    assert(run() == run())
  }

  /** Mean ‖x − decode(encode(x))‖² over a corpus at the (m, k) budget. */
  private def reconstructionMse(df: org.apache.spark.sql.DataFrame,
      m: Int, k: Int): Double = {
    val booksDf = Pq.fitCodebooks(df, "vec_id", "embedding",
      m = m, k = k, iterations = 3)
    val books = Pq.collectBooks(booksDf)
    val coded = Pq.encodeCodes(df, "vec_id", "embedding", booksDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val rows = df.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v")).collect()
    val errs = rows.map { r =>
      val x = r.getSeq[Double](1)
      val recon = coded(r.getLong(0)).zipWithIndex
        .flatMap { case (c, s) => books(s)(c) }
      x.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    errs.sum / errs.length
  }

  test("OPQ: the eigen-rotation basis is orthonormal, and rotation " +
      "preserves exact norms/dots") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val basis = Opq.rotationBasis(emb, "embedding", m = M)
    val d = basis.length
    assert(basis.forall(_.length == d))
    for (i <- 0 until d; j <- i until d) {
      val dot = basis(i).zip(basis(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"B·Bᵀ[$i][$j] = $dot")
    }
    // norm preservation on real rows (rotation-invariance of the dot
    // products the ADC ranking is built from)
    val pre = emb.select(col("vec_id"), transform(col("embedding"),
      _.cast("double")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => x * x).sum).toMap
    Opq.rotate(emb.limit(50), "vec_id", "embedding", basis).collect()
      .foreach { r =>
        val n2 = r.getSeq[Double](1).map(x => x * x).sum
        assert(math.abs(n2 - pre(r.getLong(0))) < 1e-8)
      }
  }

  /** The testdata embeddings scaled + neighbor-mixed into a CORRELATED,
    * variance-decaying corpus (y_j = (x_j + x_{j+1 mod d}) · w_j, w
    * decaying 4→1) — deterministic, and exactly the regime OPQ exists
    * for: contiguous coordinate blocks then carry unequal variance
    * products and within-block correlation, both of which the
    * eigen-rotation + sum-balanced variance allocation remove.
    */
  private def anisotropic(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val d = 64
    val prepped = df.select(col("vec_id"), explode(array(struct(
      transform(col("embedding"), _.cast("double")).as("v")))).as("s"))
      .select(col("vec_id"), col("s.v").as("v"))
    prepped.select(col("vec_id"),
      transform(sequence(lit(0), lit(d - 1)), j =>
        (element_at(col("v"), j + 1) +
          element_at(col("v"), pmod(j + 1, lit(d)) + 1)) *
          (lit(1.0) + (lit((d - 1).toDouble) - j) / lit(21.0)))
        .as("embedding"))
  }

  test("OPQ vs raw PQ, measured both regimes: never-worse on the " +
      "near-isotropic testdata, a real MSE drop on a correlated " +
      "anisotropic corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // regime 1 — the natural corpus is near-isotropic (top/bottom
    // eigenvalue ratio ~4): the parametric rotation has little to work
    // with, so the pin is "never worse beyond k-means seeding noise"
    // (measured: ~7% BETTER — the sum-balanced allocation still
    // extracts the mild spectrum slope)
    val rawIso = reconstructionMse(emb, M, K)
    val isoBasis = Opq.rotationBasis(emb, "embedding", m = M)
    val opqIso = reconstructionMse(
      Opq.rotate(emb, "vec_id", "embedding", isoBasis), M, K)
    info(f"isotropic: raw=$rawIso%.6f opq=$opqIso%.6f " +
      f"(${(1 - opqIso / rawIso) * 100}%.1f%% lower)")
    assert(opqIso < rawIso * 1.02,
      f"near-isotropic corpus: OPQ $opqIso%.6f must not lose to raw " +
        f"$rawIso%.6f beyond seeding noise")
    // regime 2 — correlated + variance-decaying: the rotation must win
    val an = anisotropic(emb).cache()
    val rawAn = reconstructionMse(an, M, K)
    val anBasis = Opq.rotationBasis(an, "embedding", m = M)
    val opqAn = reconstructionMse(
      Opq.rotate(an, "vec_id", "embedding", anBasis), M, K)
    an.unpersist()
    info(f"anisotropic: raw=$rawAn%.6f opq=$opqAn%.6f " +
      f"(${(1 - opqAn / rawAn) * 100}%.1f%% lower)")
    assert(opqAn < rawAn,
      f"anisotropic corpus: OPQ MSE $opqAn%.6f must beat raw PQ $rawAn%.6f")
  }

  test("OPQ_NP: alternating Lloyd+Procrustes basis is orthonormal, " +
      "deterministic, and refines the parametric rotation's MSE on the " +
      "anisotropic corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val an = anisotropic(emb).cache()
    try {
      val pBasis = Opq.rotationBasis(an, "embedding", m = M)
      val npBasis = Opq.rotationBasisNp(an, "vec_id", "embedding",
        m = M, k = K)
      val d = npBasis.length
      for (i <- 0 until d; j <- i until d) {
        val dot = npBasis(i).zip(npBasis(j)).map { case (a, b) => a * b }.sum
        val expect = if (i == j) 1.0 else 0.0
        assert(math.abs(dot - expect) < 1e-9, s"NP B·Bᵀ[$i][$j] = $dot")
      }
      // exact-integer cross-cov + fixed sweep order ⇒ bit-identical reruns
      val again = Opq.rotationBasisNp(an, "vec_id", "embedding", m = M, k = K)
      assert(npBasis.flatten.toSeq == again.flatten.toSeq,
        "rotationBasisNp must be deterministic run to run")
      val mseP = reconstructionMse(
        Opq.rotate(an, "vec_id", "embedding", pBasis), M, K)
      val mseNp = reconstructionMse(
        Opq.rotate(an, "vec_id", "embedding", npBasis), M, K)
      info(f"anisotropic: opq_p=$mseP%.6f opq_np=$mseNp%.6f " +
        f"(${(1 - mseNp / mseP) * 100}%.1f%% lower)")
      // the registration gate (r13 verdict ask #8): NP must measure
      // BELOW the parametric variant at the same (m, k) budget
      assert(mseNp < mseP,
        f"OPQ_NP MSE $mseNp%.6f must beat parametric OPQ $mseP%.6f")
    } finally an.unpersist()
  }

  test("procrustes: recovers a planted rotation and maximizes the trace") {
    // plant R0 (a signed permutation), M = R0ᵀ·D for a positive
    // diagonal D ⇒ argmax_R tr(R·M) is exactly R0
    val d = 6
    val perm = Array(2, 0, 5, 1, 4, 3)
    val sign = Array(1.0, -1.0, 1.0, 1.0, -1.0, 1.0)
    val r0 = Array.tabulate(d, d)((i, j) =>
      if (perm(i) == j) sign(i) else 0.0)
    val diag = Array(5.0, 4.0, 3.0, 2.0, 1.0, 0.5)
    val m0 = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => r0(k)(i) * (if (k == j) diag(k) else 0.0)).sum)
    val r = Opq.procrustes(m0)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(r(i)(j) - r0(i)(j)) < 1e-10, s"R[$i][$j]")
  }

  test("OPQ: greedy sum-balanced variance allocation equalizes subspace " +
      "variance sums and partitions all dimensions") {
    // Opq.allocate deliberately balances per-subspace variance SUMS,
    // NOT Ge et al.'s λ-product criterion (measured worse at this
    // engine's low code rate — Opq.allocate's doc records the 29 % MSE
    // win). Do not "fix" this toward product balancing.
    val lambdas = Seq(8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0)
    val groups = Opq.allocate(lambdas, m = 4)
    assert(groups.flatten.sorted == (0 until 8))
    assert(groups.forall(_.size == 2))
    val sums = groups.map(_.map(lambdas).sum).toSet
    // the greedy sum balance lands the big-with-small pairing
    // 8+1/7+2/6+3/5+4 — every subspace at exactly the mean Σλ of 9
    assert(sums == Set(9.0), sums.toString)
    // the equal-product set {8,14,18,20} is a CONSEQUENCE of that
    // pairing on this input, not the criterion being optimized
    val prods = groups.map(_.map(lambdas).product).toSet
    assert(prods == Set(8.0, 14.0, 18.0, 20.0), prods.toString)
  }

  test("fixture: exactness preconditions the oracle replay relies on") {
    // the q_ann_pq_fixture / q_ann_ivfpq_fixture hash-match argument
    // requires every pinned value to be a small integer (integer dots
    // are exact in double regardless of summation order) and no
    // zero-norm vector/reconstruction anywhere (both engines would
    // then hit the 0-guard — fine — but a zero corpus vector would also
    // make ranks degenerate, weakening the fixture). Guard the fixture
    // against drift that silently voids the argument.
    import graft.ann.PqFixture
    def allInts(vs: Seq[Double]): Boolean = vs.forall(x => x == x.toInt.toDouble)
    assert(PqFixture.corpus.forall { case (_, v) => allInts(v) })
    assert(PqFixture.codebooks.forall { case (_, _, c) => allInts(c) })
    assert(PqFixture.centroids.forall { case (_, c) => allInts(c) })
    assert(PqFixture.means.forall { case (_, m) => allInts(m) })
    assert(PqFixture.corpus.forall { case (_, v) => v.exists(_ != 0.0) },
      "fixture corpus must contain no zero vector")
    assert(PqFixture.centroids.forall { case (_, c) => c.exists(_ != 0.0) },
      "routing centroids must be non-zero")
    assert(PqFixture.corpus.size == 24 &&
      PqFixture.corpus.map(_._1).distinct.size == 24)
    // dims stay divisible by m — the subDimChecked contract
    assert(PqFixture.dim % PqFixture.m == 0)
    // IVF-PQ recon = mean + codeword per 2-dim block must never be the
    // zero vector for any ASSIGNED cell/codeword combination actually
    // produced (zero rnorm would collapse the served cosine to the
    // 0-guard and hide ranking bugs): check against the engine's codes
    val ct = graft.ann.IvfPq.encode(PqFixture.corpusDf(spark),
      PqFixture.assignmentsDf(spark), PqFixture.meansDf(spark),
      PqFixture.centroidsDf(spark), PqFixture.codebooksDf(spark),
      "vec_id", "embedding")
    assert(ct.filter(col("rnorm") === 0.0).count() == 0)
    assert(ct.count() == 24)
  }

  test("fixture serving is deterministic and full-size") {
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(x => (x._1, x._2))
    val pq = run(graft.queries.AnnQ.pqFixtureTopK(spark, ""))
    assert(pq.size == 15) // 3 queries x top-5
    assert(pq == run(graft.queries.AnnQ.pqFixtureTopK(spark, "")))
    val ivfpq = run(graft.queries.AnnQ.ivfPqFixtureTopK(spark, ""))
    assert(ivfpq.size == 15)
    assert(ivfpq == run(graft.queries.AnnQ.ivfPqFixtureTopK(spark, "")))
    // the doubly-reduced probe serves from 2 of 4 cells, so its
    // candidate pool differs from plain PQ's full scan — the two
    // fixtures must NOT be trivially identical (that would mean the
    // cell pruning did nothing on this corpus)
    assert(pq != ivfpq)
  }

  test("empty codebook table fails with a named message; null vector " +
      "raises the explicit null-vector branch") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val emptyBooks = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "subspace INT, code INT, centroid ARRAY<DOUBLE>"))
    val e = intercept[IllegalArgumentException] {
      Pq.encode(corpus, "vec_id", "embedding", emptyBooks).collect()
    }
    assert(e.getMessage.contains("empty codebook table"))
    // a null vector must take subDimChecked's explicit null-vector
    // raise branch: size(null) is null, so without the branch the
    // otherwise-arm raises a garbled concat-with-null message. (When
    // inlined into a slice lambda the check is lazily skipped — Slice
    // short-circuits on its null first child — so pin the expression
    // where it IS evaluated.)
    val withNull = Seq(
      (1L, Some(Seq(1.0, 2.0))), (3L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      withNull.select(Pq.subDimChecked(col("embedding"), 1)).collect()
    }
    def all(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + all(t.getCause)
    assert(all(e2).contains("PQ: null vector"))
  }
}
