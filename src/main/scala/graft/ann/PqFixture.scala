package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinned fixture for the PQ / IVF-PQ serving ORACLE — the
  * [[graft.dedup.SimhashFixture]] pattern applied to ADC ranking.
  *
  * The corpus-scale q_ann_pq / q_ann_ivfpq stay rows-only: their
  * codebooks come from seeded Lloyd training whose float means no SQL
  * engine replays bit-for-bit. But the SERVING math — encode (argmin
  * code per subspace), the LUT construction, the ADC dot, rnorm, the
  * cosine division and the (cosine desc, neighbor_id) ranking — is
  * exact arithmetic when every pinned value is a small integer: integer
  * dots are exact in DOUBLE regardless of summation order, sqrt/division
  * are correctly-rounded IEEE ops identical in both engines, so DuckDB
  * can replay the whole serve path from the same pinned artifacts and
  * the comparison is a HASH match, not an approximation.
  *
  * Everything derives from formulas over (id, position) so the Scala
  * side and the rendered SQL VALUES can never drift apart; the
  * codebooks/means/centroids are pinned integer grids (declared
  * artifacts, not trained — training determinism is differentially
  * spec-pinned in PqSpec/IvfPqSpec; THIS fixture verifies serving).
  * Corpus ids repeat their pattern every 9 ids, planting exact
  * duplicates that exercise the neighbor_id tiebreak.
  */
object PqFixture {

  val dim = 8
  val m = 4 // subspaces of 2 dims
  val k = 4 // codes per subspace
  val nCells = 4 // IVF cells

  /** (vec_id, embedding) — 24 vectors, components in [-4, 4]. */
  val corpus: Seq[(Long, Seq[Double])] =
    (0L until 24L).map(i =>
      i -> (0 until dim).map(j => (((i * 5 + j * 3) % 9) - 4).toDouble))

  /** (subspace, code, centroid) — the same 2-dim integer grid
    * (±2, ±2) in every subspace; shared by the plain-PQ and the
    * residual (IVF-PQ) fixture paths.
    */
  val codebooks: Seq[(Int, Int, Seq[Double])] =
    for (s <- 0 until m; c <- 0 until k)
      yield (s, c, Seq(((c % 2) * 4 - 2).toDouble, ((c / 2) * 4 - 2).toDouble))

  /** (cluster, centroid) — integer routing directions for the IVF-PQ
    * probe (routing ranks by raw dot, so unnormalized integers are a
    * valid spherical ranking).
    */
  val centroids: Seq[(Int, Seq[Double])] =
    (0 until nCells).map(c =>
      c -> (0 until dim).map(j => (((c * 3 + j * 5) % 7) - 3).toDouble))

  /** (cluster, mean) — integer coarse terms for the residual path. */
  val means: Seq[(Int, Seq[Double])] =
    (0 until nCells).map(c =>
      c -> (0 until dim).map(j => (((c * 2 + j) % 5) - 2).toDouble))

  /** (vec_id, cluster) — pinned cell assignment (id mod nCells). */
  val assignments: Seq[(Long, Int)] =
    corpus.map { case (id, _) => id -> (id % nCells).toInt }

  def corpusDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    corpus.toDF("vec_id", "embedding")
  }

  def codebooksDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    codebooks.toDF("subspace", "code", "centroid")
  }

  def centroidsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    centroids.toDF("cluster", "centroid")
  }

  def meansDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    means.toDF("cluster", "mean")
  }

  def assignmentsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    assignments.toDF("vec_id", "cluster")
  }

  /** The pinned OPQ rotation: a SIGNED PERMUTATION (y_j = s_j·x_{π(j)},
    * π = dimension reversal, s alternating) — orthonormal with integer
    * entries, so the rotated corpus stays integer-exact and the whole
    * rotate→argmin-encode→ADC path replays in DuckDB as list reorder +
    * negate. The learned eigen-rotation's SERVING math is identical;
    * only the basis values differ.
    */
  val opqRotation: Array[Array[Double]] =
    Array.tabulate(dim, dim)((j, c) =>
      if (c == dim - 1 - j) (if (j % 2 == 0) 1.0 else -1.0) else 0.0)

  /** The [[opqRotation]] applied in SQL: the rotated embedding as a
    * DuckDB list expression over a 1-based `emb` list column.
    */
  def opqRotationSql(emb: String): String =
    (0 until dim).map { j =>
      val src = s"$emb[${dim - j}]" // π(j) = dim-1-j, 1-based
      if (j % 2 == 0) src else s"-$src"
    }.mkString("[", ", ", "]")

  private def arr(v: Seq[Double]): String =
    v.map(_.toInt).mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** VALUES rows for the oracle CTEs. */
  def corpusValuesSql: String =
    corpus.map { case (id, v) => s"(CAST($id AS BIGINT), ${arr(v)})" }
      .mkString(",\n  ")

  def codebooksValuesSql: String =
    codebooks.map { case (s, c, v) => s"($s, $c, ${arr(v)})" }
      .mkString(",\n  ")

  def centroidsValuesSql: String =
    centroids.map { case (c, v) => s"($c, ${arr(v)})" }.mkString(",\n  ")

  def meansValuesSql: String =
    means.map { case (c, v) => s"($c, ${arr(v)})" }.mkString(",\n  ")

  def assignmentsValuesSql: String =
    assignments.map { case (id, c) => s"(CAST($id AS BIGINT), $c)" }
      .mkString(",\n  ")
}
