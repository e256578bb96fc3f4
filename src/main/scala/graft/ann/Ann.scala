package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set against the corpus, one narrow pass + a per-query-key
  *    shuffle for the ranking window. Correctness baseline, and the
  *    right answer whenever |queries| is small: the corpus is scanned
  *    once regardless of corpus size.
  *  - [[lshNeighbors]] — sign-random-hyperplane LSH: L independent
  *    tables of `bitsPerTable` hyperplanes each; vectors collide with a
  *    query iff all bits of some table agree. The corpus-side cost
  *    becomes one bucket-key equi-join instead of |Q|×|N| cosines —
  *    the 100 TB path. Recall/cost tunes with (L, bits): more tables ↑
  *    recall, more bits ↓ candidates. Hyperplanes are generated from a
  *    seeded LCG on the driver and shipped as literals, so plans are
  *    deterministic and the planes cost nothing per row.
  */
object Ann {

  /** Cast a float-array column to double for deterministic arithmetic. */
  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** L2 norm via an index-order fold (cross-engine deterministic). */
  private def l2(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  /** Index-order-fold dot product of two double arrays. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, p) => acc + p)

  /** Exact cosine top-`k` neighbors per query. `queries` must be small
    * enough to broadcast (the usual ANN-serving shape); self-matches are
    * excluded by id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("vc"))
      .withColumn("nc", l2(col("vc")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("vq"))
      .withColumn("nq", l2(col("vq")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("vc"), col("vq")) / (col("nc") * col("nq")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic uniform[-1,1] hyperplanes from a 64-bit LCG. */
  def planes(seed: Long, n: Int, dim: Int): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(n)(Seq.fill(dim)(next()))
  }

  /** Packed sign bits of `v` against each plane (one long per table). */
  private def bucketOf(v: Column, ps: Seq[Seq[Double]]): Column =
    ps.zipWithIndex.map { case (plane, i) =>
      val d = plane.zipWithIndex
        .map { case (w, j) => element_at(v, j + 1) * lit(w) }
        .reduce(_ + _)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed approximate top-`k`: candidates are corpus rows that
    * share any table's full bucket with the query, then exact cosine +
    * ranking on candidates only. Output shape matches
    * [[bruteForceTopK]]; recall < 1 by design (see AnnSpec for the
    * measured recall/candidate trade-off on the testdata).
    */
  def lshNeighbors(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      tables: Int = 32, bitsPerTable: Int = 6, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val allPlanes = (0 until tables).map(t =>
      planes(seed + t, bitsPerTable, dim))
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val v = asDouble(col(vec))
      val buckets = array(allPlanes.zipWithIndex.map { case (ps, t) =>
        struct(lit(t).as("table"), bucketOf(v, ps).as("bucket"))
      }: _*)
      df.select(col(id), v.as("v"), explode(buckets).as("tb"))
        .select(col(id), col("v"), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
    }
    val cb = withBuckets(corpus.select(col(idCol).as("neighbor_id"), col(vecCol)),
      "neighbor_id", vecCol)
    val qb = withBuckets(queries.select(col(idCol).as("query_id"), col(vecCol)),
      "query_id", vecCol)
      .withColumnRenamed("v", "vq")
    val candidates = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("v"), col("vq"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("cosine",
        dot(col("v"), col("vq")) / (l2(col("v")) * l2(col("vq"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
