package graft.ann

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** OPTIMIZED product quantization, parametric form (Ge et al., CVPR
  * 2013, "Optimized Product Quantization for Approximate Nearest
  * Neighbor Search", §4 OPQ_P; reference pipeline has no ANN at all —
  * this is the natural capstone on the [[Pca]] eigenbasis): rotate the
  * space by the PCA eigenbasis, PERMUTE the rotated dimensions into the
  * m subspaces balancing per-subspace variance (see [[allocate]] for
  * the measured low-rate deviation from the paper's λ-product
  * criterion), then train/serve plain [[Pq]] in the rotated space.
  *
  * Dot products are ROTATION-INVARIANT (the basis is orthonormal):
  * rotating corpus and queries with the same R leaves every exact
  * cosine unchanged, so OPQ changes only WHERE the quantization error
  * lands — PqSpec measures the reconstruction-MSE drop vs raw PQ on the
  * same corpus and code budget.
  *
  * Scale shape: the eigenbasis comes from [[Pca.covariance]]'s two
  * exact-integer corpus passes (O(d²) mergeable state) plus the
  * driver-side 30-step power iteration per component; the rotation is
  * ONE narrow per-row pass with the d×d basis as a broadcast literal
  * (no shuffle, no UDF); training/encode/serve are [[Pq]] unchanged.
  */
object Opq {

  /** Greedy eigenvalue allocation: process dimensions in descending-λ
    * order, assign each to the non-full subspace with the smallest
    * running Σλ — balance TOTAL subspace variance. Returns, per
    * subspace, the eigen-indices it owns — each exactly d/m of them.
    *
    * Measured deviation from the paper: Ge et al. balance the λ
    * PRODUCT, optimal under the high-rate independent-Gaussian model.
    * At this engine's practical budget (k = 32 codes on 4-dim
    * subspaces — ~1.25 bits/dim, nowhere near high-rate) the product
    * criterion concentrates one huge-λ direction per subspace and
    * measured WORSE than no rotation at all on a correlated corpus
    * (Lloyd MSE 3.09 vs 2.34 raw), while sum-balancing measured 1.67
    * — a 29 % drop (PqSpec pins the win). Same greedy machinery, the
    * low-rate-robust criterion.
    */
  def allocate(lambdas: Seq[Double], m: Int): Seq[Seq[Int]] = {
    require(lambdas.size % m == 0,
      s"OPQ: dim ${lambdas.size} not divisible by m=$m")
    val subDim = lambdas.size / m
    val order = lambdas.zipWithIndex.sortBy { case (l, i) => (-l, i) }
    val sums = Array.fill(m)(0.0)
    val groups = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    order.foreach { case (l, i) =>
      val open = (0 until m).filter(s => groups(s).size < subDim)
      // smallest running variance sum wins; index tiebreak for determinism
      val s = open.minBy(s => (sums(s), s))
      groups(s) += i
      sums(s) += l
    }
    groups.map(_.toSeq).toSeq
  }

  /** The OPQ_P rotation: rows are the corpus' PCA eigenvectors (the
    * [[Pca.powerIterate]] 30-step contract — orthonormal by
    * construction via per-step Gram–Schmidt deflation; eigen-accurate
    * where the variance actually is) ordered SUBSPACE-MAJOR by the
    * greedy variance-balancing allocation, so row block s·(d/m)…(s+1)·(d/m)−1
    * is subspace s's coordinate system.
    */
  def rotationBasis(df: DataFrame, vecCol: String,
      m: Int): Array[Array[Double]] = {
    val (c, _, _) = Pca.covariance(df, vecCol)
    val eig = Pca.powerIterate(c, c.length)
    allocate(eig.map(_._2), m).flatten.map(i => eig(i)._1).toArray
  }

  /** Rotate `vecCol` by `basis` (rows): y_j = Σ_k basis(j)(k)·x_k via
    * the native [[graft.functions.MatVecProduct]] loop (input-index
    * accumulation order per output coordinate — bit-identical to the
    * per-dim zip_with folds it replaced). One narrow pass; the basis
    * ships once as a reference object.
    */
  def rotate(df: DataFrame, idCol: String, vecCol: String,
      basis: Array[Array[Double]]): DataFrame =
    // native mat-vec loop (r16): the per-output-dim aggregate(zip_with)
    // folds paid d² interpreted dispatches + d array allocations per
    // row over the full-corpus rotate pass of every OPQ build — and
    // needed an explode barrier just to evaluate the cast once. One
    // expression consumes the cast vector once; accumulation order and
    // results are bit-identical (MatVecProduct scaladoc + differential)
    df.select(col(idCol), graft.functions.MatVecProduct.ofColumn(
      col(vecCol).cast("array<double>"),
      basis.toSeq.map(_.toSeq)).as(vecCol))

  /** Cross-covariance aggregator for the Procrustes step: folds each
    * row's d² products x_i·ŷ_j into an exact integer micro-unit buffer
    * (x enters as micro-longs, the product is re-floored to micro — the
    * [[Pca.CovarAgg]] discipline), so the accumulated matrix is
    * order-free and two runs agree to the bit regardless of
    * partitioning.
    */
  final class CrossCovAgg(d: Int)
      extends Aggregator[(Seq[Long], Seq[Double]), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](d * d)
    override def reduce(acc: Array[Long],
        row: (Seq[Long], Seq[Double])): Array[Long] = {
      val (xm, yh) = row
      require(xm.length == d && yh.length == d,
        s"opq_np: expected dim $d, got (${xm.length}, ${yh.length})")
      var i = 0
      while (i < d) {
        val x = xm(i).toDouble / Pca.Micro
        var j = 0
        while (j < d) {
          acc(i * d + j) += math.floor(x * yh(j) * Pca.Micro + 0.5).toLong
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

  /** The orthogonal Procrustes factor of `m0`: the rotation R (rows =
    * output coordinates) maximizing tr(R·M), i.e. R = V·Uᵀ for the SVD
    * M = U·Σ·Vᵀ — computed by one-sided (Hestenes) Jacobi: Givens
    * rotations orthogonalize M's columns in a FIXED (p, q) sweep order
    * while accumulating V; left vectors fall out as the normalized
    * columns. Deterministic: fixed sweep order, fixed convergence
    * threshold, and R is invariant to the (sign, order) SVD ambiguities
    * because U and V absorb them identically. Near-zero singular
    * directions (rank-deficient M) are completed by Gram–Schmidt
    * against the standard basis — any orthogonal completion attains the
    * same trace, the deterministic one keeps runs identical.
    */
  private[ann] def procrustes(m0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m0.length
    require(m0.forall(_.length == d), "procrustes: matrix must be square")
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 60 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var alpha = 0.0; var beta = 0.0; var gamma = 0.0
          var i = 0
          while (i < d) {
            alpha += a(i)(p) * a(i)(p)
            beta += a(i)(q) * a(i)(q)
            gamma += a(i)(p) * a(i)(q)
            i += 1
          }
          if (alpha > 0.0 && beta > 0.0)
            off = math.max(off, math.abs(gamma) / math.sqrt(alpha * beta))
          if (math.abs(gamma) > 1e-300) {
            val zeta = (beta - alpha) / (2.0 * gamma)
            val t = math.signum(zeta) /
              (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            var r = 0
            while (r < d) {
              val ap = a(r)(p); val aq = a(r)(q)
              a(r)(p) = c * ap - s * aq; a(r)(q) = s * ap + c * aq
              val vp = v(r)(p); val vq = v(r)(q)
              v(r)(p) = c * vp - s * vq; v(r)(q) = s * vp + c * vq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U columns: normalized A columns where σ_j is meaningful; deflated
    // Gram–Schmidt completion from the standard basis where σ_j ≈ 0
    val sigma = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < d) { s += a(i)(j) * a(i)(j); i += 1 }
      math.sqrt(s)
    }
    val sigMax = sigma.max.max(1e-300)
    val u = Array.ofDim[Double](d, d) // u(j) = column j of U
    val filled = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (j <- 0 until d if sigma(j) > sigMax * 1e-12) {
      var i = 0
      while (i < d) { u(j)(i) = a(i)(j) / sigma(j); i += 1 }
      filled += j
    }
    for (j <- 0 until d if sigma(j) <= sigMax * 1e-12) {
      // first standard basis vector with a non-degenerate residual
      var done = false
      var e = 0
      while (!done && e < d) {
        val w = Array.tabulate(d)(i => if (i == e) 1.0 else 0.0)
        filled.foreach { f =>
          var pr = 0.0; var i = 0
          while (i < d) { pr += w(i) * u(f)(i); i += 1 }
          i = 0
          while (i < d) { w(i) -= pr * u(f)(i); i += 1 }
        }
        val n = math.sqrt(w.map(x => x * x).sum)
        if (n > 1e-6) {
          var i = 0
          while (i < d) { u(j)(i) = w(i) / n; i += 1 }
          filled += j
          done = true
        }
        e += 1
      }
      require(done, "procrustes: could not complete a left basis column")
    }
    // R = V·Uᵀ: R(i)(k) = Σ_j v(i)(j)·u_col_j(k)
    Array.tabulate(d, d) { (i, k) =>
      var s = 0.0; var j = 0
      while (j < d) { s += v(i)(j) * u(j)(k); j += 1 }
      s
    }
  }

  /** OPQ_NP — the NON-parametric refinement (Ge et al. CVPR 2013 §3):
    * alternate [a] fix R, train/encode plain [[Pq]] in the rotated
    * space (Lloyd), with [b] fix the codes, solve the orthogonal
    * Procrustes problem min_R ‖X·Rᵀ − Ŷ‖_F over the ACTUAL quantization
    * error (cross-covariance M = Σ x·ŷᵀ accumulated distributively in
    * exact integer micro-units; d×d SVD on the driver). Initialized
    * from the parametric eigenbasis ([[rotationBasis]]), so it can only
    * refine the regime OPQ_P already wins. Each alternation costs one
    * rotate pass + the Lloyd fit + one encode/cross-cov pass — all
    * corpus-sized work stays distributed, the driver holds d² state.
    *
    * TRAINING SAMPLE (r16): the whole alternation loop runs on the
    * deterministic xxhash64 sample of [[Pq.fitCodebooks]]'s recipe
    * (d = ⌊N / (k·trainPerCode)⌋, unsampled under 2× the bound) — a
    * rotation is d² parameters estimated from the sample's
    * cross-covariance, and each alternation otherwise costs THREE
    * full-corpus passes (rotate, Lloyd, encode+cross-cov). The
    * parametric PCA init ([[rotationBasis]]) stays full-corpus: one
    * exact pass, and it keeps q_ann_opq's basis bit-identical at every
    * SF. Oracled SFs and fixtures sit under the floor → unsampled,
    * bit-unchanged.
    */
  def rotationBasisNp(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int = 32, alternations: Int = 3,
      lloydIters: Int = 2, trainPerCode: Int = 64): Array[Array[Double]] = {
    var basis = rotationBasis(df, vecCol, m)
    val d = basis.length
    val samp = math.max(1L, df.count() / (k.toLong * trainPerCode))
    val train = if (samp <= 1L) df
      else df.filter(pmod(xxhash64(col(idCol)), lit(samp)) === 0)
    // original vectors as exact micro-longs, keyed for the code join
    val xm = train.select(col(idCol).as("np_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * Pca.Micro + lit(0.5)).cast("long"))
        .as("xm"))
    for (_ <- 1 to alternations) {
      val rotated = rotate(train, idCol, vecCol, basis)
      val books = Pq.fitCodebooks(rotated, idCol, vecCol, m, k, lloydIters)
      val booksArr = Pq.collectBooks(books)
      val blit = typedlit(booksArr.map(_.map(_.toIndexedSeq)))
      val yh = flatten(transform(sequence(lit(0), lit(m - 1)), s =>
        element_at(element_at(blit, s + 1),
          element_at(col("codes"), s + 1) + 1)))
      val pairs = xm
        .join(Pq.encodeCodesWith(rotated, idCol, vecCol, booksArr)
          .select(col(idCol).as("np_id"), col("codes")), "np_id")
        .select(col("xm"), yh.as("yh"))
      val flat = pairs
        .agg(udaf(new CrossCovAgg(d),
          ExpressionEncoder[(Seq[Long], Seq[Double])]())
          .apply(col("xm"), col("yh")).as("m"))
        .head().getAs[scala.collection.Seq[Long]]("m")
      basis = procrustes(Array.tabulate(d, d)((i, j) =>
        flat(i * d + j).toDouble / Pca.Micro))
    }
    basis
  }
}
