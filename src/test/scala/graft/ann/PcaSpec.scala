package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** The PCA contract is "30 deflated power-iteration steps from v₀" —
  * deterministic, oracled bit-for-bit. This spec certifies that the
  * contract's RESULT is also a genuine eigenbasis of the covariance:
  * residuals small, basis orthonormal, eigenvalues ordered, plus the
  * exact-integer covariance invariances the fixed-precision design
  * guarantees.
  */
class PcaSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val cov = Pca.covariance(
    graft.Tables(spark, dir, "embeddings"), "embedding")._1

  private lazy val eigs = Pca.powerIterate(cov, 3)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("covariance is symmetric with non-negative diagonal") {
    val d = cov.length
    assert(d === 64)
    for (i <- 0 until d) {
      assert(cov(i)(i) >= 0.0, s"var($i)")
      for (j <- 0 until i)
        assert(cov(i)(j) === cov(j)(i), s"sym($i,$j)")
    }
  }

  test("covariance is partitioning-invariant (exact integer sums)") {
    val emb = graft.Tables(spark, dir, "embeddings")
    val a = Pca.covariance(emb.repartition(3), "embedding")._1
    val b = Pca.covariance(emb.repartition(17), "embedding")._1
    assert(a.flatten.toSeq === b.flatten.toSeq) // bit-identical
  }

  test("the 30-step vectors are genuine eigenpairs: small residuals") {
    for (((v, lambda), m) <- eigs.zipWithIndex) {
      val cv = cov.map(row => dot(row, v))
      val resid = math.sqrt(
        cv.zip(v).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
      assert(lambda > 0.0, s"λ${m + 1}")
      assert(resid / lambda < 0.05,
        s"component ${m + 1}: residual ${resid / lambda}")
    }
  }

  test("the basis is orthonormal and eigenvalues are ordered") {
    val vs = eigs.map(_._1)
    for (i <- vs.indices) {
      assert(math.abs(dot(vs(i), vs(i)) - 1.0) < 1e-9, s"norm($i)")
      for (j <- 0 until i)
        assert(math.abs(dot(vs(i), vs(j))) < 1e-6, s"ortho($i,$j)")
    }
    val ls = eigs.map(_._2)
    assert(ls === ls.sorted.reverse, s"λ ordering $ls")
  }

  test("variance explained is sane: each in (0,1], sum ≤ 1 + eps") {
    val trace = (0 until cov.length).map(i => cov(i)(i)).sum
    val ratios = eigs.map(_._2 / trace)
    ratios.foreach(r => assert(r > 0.0 && r <= 1.0, s"ratio $r"))
    assert(ratios.sum <= 1.0 + 1e-9)
    // non-vacuous: the top component explains a real share
    assert(ratios.head > 0.01, s"top component ${ratios.head}")
  }

  test("projection: per-component mean ≈ 0 and variance ≈ λ") {
    val rows = Pca.embedProject(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val n = rows.length
    assert(n === 500)
    val lambdas = Pca.powerIterate(cov, 4).map(_._2)
    val cols = Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3), rows.map(_._4))
    for ((ys, m) <- cols.zipWithIndex) {
      val mean = ys.sum / n
      val variance = ys.map(y => (y - mean) * (y - mean)).sum / n
      // centered projections: mean vanishes up to micro-rounding
      assert(math.abs(mean) < 1e-3, s"pc${m + 1} mean $mean")
      // var of the m-th PCA coordinate IS the m-th eigenvalue
      assert(math.abs(variance - lambdas(m)) / lambdas(m) < 0.05,
        s"pc${m + 1} var $variance vs λ ${lambdas(m)}")
    }
  }

  test("q_embed_pca rows mirror the driver math") {
    val rows = Pca.embedPca(spark, dir).collect()
    assert(rows.length === 3)
    val trace = (0 until cov.length).map(i => cov(i)(i)).sum
    for ((r, i) <- rows.zipWithIndex) {
      assert(r.getInt(0) === i + 1)
      assert(math.abs(r.getDouble(1) - eigs(i)._2) < 1e-4)
      assert(math.abs(r.getDouble(2) - eigs(i)._2 / trace) < 1e-6)
    }
  }
}
