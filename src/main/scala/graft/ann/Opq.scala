package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rotate `vecCol` by `basis` (rows): y_j = Σ_k basis(j)(k)·x_k, each
    * output coordinate an ordered fold over one zip_with — the
    * [[Pca.embedProject]] expression shape at full output width. One
    * narrow pass; the basis ships as literals.
    */
  def rotate(df: DataFrame, idCol: String, vecCol: String,
      basis: Array[Array[Double]]): DataFrame = {
    // materialize the cast vector behind a Generate barrier first:
    // referencing a computed transform inside d output-dim lambdas
    // would re-run the cast chain per output dimension after
    // CollapseProject inlines it (the Quantize.prepared discipline)
    val prepped = df.select(col(idCol), explode(array(struct(
      transform(col(vecCol), _.cast("double")).as("x")))).as("s"))
      .select(col(idCol), col("s.x").as("x"))
    val ys: Seq[Column] = basis.toSeq.map { row =>
      aggregate(zip_with(col("x"), typedlit(row.toSeq), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v)
    }
    prepped.select(col(idCol), array(ys: _*).as(vecCol))
  }
}
