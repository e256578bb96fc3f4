package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinned fixture for the LSH serving ORACLE — the [[PqFixture]]
  * pattern applied to sign-random-hyperplane bucketing.
  *
  * The corpus-scale q_ann_lsh stays rows-only: its hyperplanes come
  * from a seeded LCG producing arbitrary doubles whose dot products no
  * SQL engine replays associativity-for-associativity. But the SERVE
  * path — per-(row, table) bucket signs, the (table, bucket) candidate
  * equi-join, self-exclusion, the exact-cosine re-rank and the
  * (cosine desc, neighbor_id) tiebreak — is exact arithmetic when the
  * planes are small integers: integer dots are exact in DOUBLE
  * regardless of summation order, so bucket bits, candidate membership,
  * cosines and ranking all hash-match DuckDB.
  *
  * The engine side runs the REAL [[Ann.lshNeighborsPlanes]] (the one
  * definition of the bucket/candidate/re-rank path, which the seeded
  * production [[Ann.lshNeighbors]] delegates to); only the plane tensor
  * is pinned. Planes and corpus both derive from formulas over their
  * indices so the Scala values and the rendered SQL VALUES can never
  * drift apart. Corpus is [[PqFixture.corpus]] (24 vectors, dim 8,
  * pattern repeats every 9 ids → planted exact duplicates exercise the
  * neighbor_id tiebreak inside shared buckets).
  */
object LshFixture {

  val tables = 4
  val bitsPerTable = 3
  val dim: Int = PqFixture.dim
  val k = 5

  /** [table][bit][dim] integer hyperplanes in [-2, 2]. */
  val planeTensor: Seq[Seq[Seq[Double]]] =
    (0 until tables).map(t => (0 until bitsPerTable).map(b =>
      (0 until dim).map(j => (((t * 7 + b * 5 + j * 3) % 5) - 2).toDouble)))

  def corpusDf(spark: SparkSession): DataFrame = PqFixture.corpusDf(spark)

  /** VALUES rows (tbl, bit, plane) for the oracle CTE. */
  def planesValuesSql: String =
    (for (t <- 0 until tables; b <- 0 until bitsPerTable) yield {
      val v = planeTensor(t)(b).map(_.toInt)
        .mkString("CAST([", ", ", "] AS DOUBLE[])")
      s"($t, $b, $v)"
    }).mkString(",\n  ")
}
