package graft.ann

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** ORACLED principal-component analysis of the embedding space — the
  * variance-structure report (top-3 eigenvalues, variance explained)
  * that decides how aggressively a vector corpus can be rotated,
  * truncated or product-quantized (the PCA half of OPQ, Ge et al.
  * CVPR 2013; ck-means / Norouzi & Fleet 2013 for the rotation view).
  *
  * Everything is cross-engine DETERMINISTIC, which no off-the-shelf
  * eigen path gives:
  *
  *  - The covariance is a FIXED-PRECISION contract: elements enter as
  *    integer micro-units (`floor(x·1e6 + 0.5)` — floor+0.5, never
  *    engine-divergent CAST rounding), centered products are re-floored
  *    to micro-units, and all corpus-sized sums are EXACT integer sums
  *    — order-free, so any partitioning and any engine agrees to the
  *    bit. The two corpus passes (mean, then centered products) are the
  *    only data-sized work: O(d) / O(d²) mergeable state per partition,
  *    map-side combined, nothing data-sized shuffles.
  *  - The eigensolver is 30 POWER-ITERATION steps from the fixed start
  *    v₀ = (1/8, …, 1/8), with Gram–Schmidt deflation against earlier
  *    components at every step. Each mat-vec row, projection, norm and
  *    deflation is a LEFT-TO-RIGHT ordered fold — the same IEEE op
  *    sequence a DuckDB `list_reduce` replays — so after 30 iterations
  *    both engines hold bit-identical vectors. The contract is "30
  *    steps from v₀", not "the true eigenpair"; PcaSpec separately
  *    certifies the result IS a good eigenpair (residual, orthonormal
  *    basis, λ ordering).
  *
  * The iteration state is one 64-vector on the driver (the centroid /
  * codebook precedent) — the corpus never participates after the two
  * aggregation passes.
  */
object Pca {

  final val Steps = 30
  final val Micro = 1e6

  /** Per-element integer micro-units: floor(x·1e6 + 0.5). */
  private def microUnits(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * Micro + lit(0.5)).cast("long"))

  /** Covariance aggregator: given the broadcast micro-mean, folds each
    * row's d² centered micro-products into an exact integer buffer.
    */
  final class CovarAgg(mu: Array[Double])
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    private val d = mu.length
    override def zero: Array[Long] = new Array[Long](d * d)
    override def reduce(acc: Array[Long], xm: Seq[Long]): Array[Long] = {
      require(xm.length == d, s"pca: expected dim $d, got ${xm.length}")
      val c = new Array[Double](d)
      var i = 0
      while (i < d) { c(i) = xm(i).toDouble / Micro - mu(i); i += 1 }
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) {
          acc(i * d + j) += math.floor(c(i) * c(j) * Micro + 0.5).toLong
          j += 1
        }
        i += 1
      }
      acc
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(acc: Array[Long]): Array[Long] = acc
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Ordered left fold Σ a(k)·b(k) — the ONE dot-product definition the
    * DuckDB list_reduce replays; every consumer below must use it.
    */
  private def dotOrdered(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var k = 0
    while (k < a.length) { s = s + a(k) * b(k); k += 1 }
    s
  }

  /** One deflated power-iteration step: w = C·v, minus the ordered
    * projections onto `prior`, normalized. Op order mirrors the SQL.
    */
  private def step(c: Array[Array[Double]], v: Array[Double],
      prior: Seq[Array[Double]]): Array[Double] = {
    val d = v.length
    var w = Array.tabulate(d)(i => dotOrdered(c(i), v))
    prior.foreach { e =>
      val p = dotOrdered(w, e)
      w = Array.tabulate(d)(k => w(k) - p * e(k))
    }
    val norm = math.sqrt(dotOrdered(w, w))
    Array.tabulate(d)(k => w(k) / norm)
  }

  /** Top-`m` eigenpairs of `c` by 30-step deflated power iteration from
    * v₀ = 1/8. Returns (eigenvector, λ as the Rayleigh quotient v·Cv).
    */
  def powerIterate(c: Array[Array[Double]], m: Int)
      : Seq[(Array[Double], Double)] = {
    val d = c.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    for (_ <- 1 to m) {
      var v = Array.fill(d)(0.125)
      val prior = out.map(_._1).toSeq
      for (_ <- 1 to Steps) v = step(c, v, prior)
      val cv = Array.tabulate(d)(i => dotOrdered(c(i), v))
      out += ((v, dotOrdered(v, cv)))
    }
    out.toSeq
  }

  /** The fixed-precision covariance matrix of the embedding column —
    * two distributed passes (exact integer micro sums), O(d²) driver
    * state.
    */
  def covariance(df: DataFrame, vecCol: String)
      : (Array[Array[Double]], Array[Double], Long) = {
    val xm = df.select(microUnits(col(vecCol)).as("xm"))
    // pass 1: per-dim sums AND the row count in one action (the per-dim
    // count IS n); d falls out as the number of groups — exactly the
    // "two distributed passes" the contract states, no extra scans
    val sums = xm.select(posexplode(col("xm")).as(Seq("dim", "v")))
      .groupBy("dim").agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(sums.nonEmpty, "pca over an empty corpus")
    val d = sums.size
    val n = sums(0)._2
    require(sums.valuesIterator.forall(_._2 == n), "pca: ragged vectors")
    val mu = Array.tabulate(d)(j => sums(j)._1.toDouble / (n * Micro))
    val flat = xm
      .agg(udaf(new CovarAgg(mu), ExpressionEncoder[Seq[Long]]())
        .apply(col("xm")).as("c"))
      .head().getAs[scala.collection.Seq[Long]]("c")
    val c = Array.tabulate(d, d)((i, j) =>
      flat(i * d + j).toDouble / n.toDouble / Micro)
    (c, mu, n)
  }

  /** q_embed_project: the corpus PROJECTED onto the top-4 principal
    * components — the dimensionality-reduction transform [[embedPca]]'s
    * report justifies (prefilter coordinates, whitening input, the PCA
    * half of OPQ). Per row y_m = Σ_k (x_k − μ_k)·e_m[k] as the same
    * ordered fold everything else here uses; the eigenbasis is the
    * 30-step contract, so the projected table hash-matches the oracle
    * coordinate-for-coordinate. One narrow corpus pass; the basis is a
    * broadcast literal.
    */
  def embedProject(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables(spark, dir, "embeddings")
    val (c, mu, _) = covariance(emb, "embedding")
    val es = powerIterate(c, 4).map(_._1)
    val xm = microUnits(col("embedding"))
    val centered = zip_with(xm, typedLit(mu.toSeq),
      (a, b) => a.cast("double") / lit(Micro) - b)
    val ys = es.zipWithIndex.map { case (e, m) =>
      round(aggregate(
        zip_with(centered, typedLit(e.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x), 6).as(s"pc${m + 1}")
    }
    emb.select((col("vec_id") +: ys): _*).orderBy(col("vec_id"))
  }

  /** q_embed_pca: (component, lambda, var_explained, vchk) for the top
    * 3 components — λ rounded at 4 dp, the variance-explained ratio and
    * the sign-invariant eigenvector checksum Σ|v_k| at 6 dp. `trace` is
    * the ordered fold over the diagonal (same discipline as every other
    * sum the oracle replays).
    */
  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables(spark, dir, "embeddings")
    val (c, _, _) = covariance(emb, "embedding")
    val d = c.length
    var trace = 0.0
    var i = 0
    while (i < d) { trace = trace + c(i)(i); i += 1 }
    val rows = powerIterate(c, 3).zipWithIndex.map { case ((v, lambda), idx) =>
      var vchk = 0.0
      var k = 0
      while (k < d) { vchk = vchk + math.abs(v(k)); k += 1 }
      Row(idx + 1, bround6(lambda, 4), bround6(lambda / trace, 6),
        bround6(vchk, 6))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("component", IntegerType, nullable = false),
        StructField("lambda", DoubleType, nullable = false),
        StructField("var_explained", DoubleType, nullable = false),
        StructField("vchk", DoubleType, nullable = false))))
  }

  /** HALF_UP decimal rounding of a double — the same result as Spark's
    * and DuckDB's `round(x, dp)` on identical inputs.
    */
  private def bround6(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
}
