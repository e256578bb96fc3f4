package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the full coarse-quantizer + product-quantizer composition
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — the layout FAISS calls IVFx,PQy). The IVF centroids
  * route queries to cells; each corpus vector stores only its cell id
  * plus PQ codes of its RESIDUAL v − c(cell). Residuals concentrate
  * near the origin, so the same codebook budget quantizes them far
  * tighter than raw vectors — the reason every production vector store
  * encodes residuals rather than vectors.
  *
  * The coarse term here is the cell MEAN, not the spherical routing
  * centroid: [[Ann.ivfCentroids]] trains spherical k-means, whose
  * centroids are unit DIRECTIONS — subtracting a direction from an
  * unnormalized vector ADDS offset error (measured on this corpus:
  * residual-vs-spherical-centroid MSE 146.6 vs raw PQ's 110.3), while
  * the mean is by definition the constant that minimizes the cells'
  * residual energy (IvfPqSpec pins residual-vs-mean strictly tighter
  * than raw PQ). Routing stays spherical — identical cells to every
  * other IVF path.
  *
  * Serving is doubly-reduced ADC: a query scans only its nProbe cells
  * (IVF pruning), and scoring a vector is m lookup-adds (PQ ADC):
  * dot(q, μ + r̂) = dot(q, μ) + Σ_s lut[s, code_s], where dot(q, μ) is
  * one driver-side double per (query, probed cell) and the lut is one
  * m×k literal per query — the residual codebooks are SHARED across
  * cells, so one table serves every probed cell. Cosine divides by
  * ‖μ + r̂‖, stored exactly at encode time.
  *
  * Scale shape mirrors [[Ann]]/[[Pq]]: training reuses
  * [[Pq.fitCodebooks]] over the residual frame (one fused job per
  * Lloyd iteration), encode is one narrow pass over the
  * assignment-joined corpus, the probe broadcasts |Q|·nProbe route rows
  * against the cell-pruned code table. Nothing corpus-sized ever
  * collects, broadcasts, or shuffles beyond the one assignment join.
  */
object IvfPq {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** (cluster → centroid) as driver matrices, 0-gap-checked. */
  private def centroidSeq(centroids: DataFrame): IndexedSeq[Seq[Double]] = {
    val rows = centroids.select(col("cluster"), col("centroid"))
      .orderBy(col("cluster")).collect()
    rows.indices.foreach(i => require(rows(i).getInt(0) == i,
      s"centroid table has a cluster gap at $i"))
    rows.map(_.getSeq[Double](1).toIndexedSeq)
  }

  /** Per-cell L2 means: (cluster, mean ARRAY<DOUBLE>) — the coarse
    * reconstruction term. ONE fused job: groupBy(cluster) with dim
    * elementwise sums plus a count (map-side combinable, shuffles
    * nCells×(dim+1) doubles). Cells the routing knows but no vector
    * landed in simply have no row — and no residuals to serve.
    */
  def cellMeans(corpus: DataFrame, assignments: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val joined = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .join(assignments.select(col(idCol), col("cluster")), idCol)
    val first = joined.select(size(col("v"))).head(1)
    require(first.nonEmpty,
      "cellMeans: corpus joined to assignments is empty — empty corpus " +
        "or stale/mismatched assignments artifact")
    val dim = first(0).getInt(0)
    val sums = (0 until dim).map(j =>
      sum(element_at(col("v"), j + 1)).as(s"s$j"))
    joined.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cluster"), array((0 until dim).map(j =>
        col(s"s$j") / col("n").cast("double")): _*).as("mean"))
  }

  /** (cluster → mean) as a DENSE driver matrix: clusters with no
    * members fill with the zero vector (routing can point at an empty
    * cell; its mean is never used against a real row).
    */
  private def meanSeq(means: DataFrame, nCells: Int): IndexedSeq[Seq[Double]] = {
    val m = means.select(col("cluster"), col("mean")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val dim = m.values.headOption.map(_.size).getOrElse(0)
    (0 until nCells).map(c => m.getOrElse(c, Seq.fill(dim)(0.0)))
  }

  /** The residual frame (id, cluster, res): corpus joined to its cell
    * assignment, residual = v − μ(cluster) via one literal lookup.
    */
  private def residuals(corpus: DataFrame, assignments: DataFrame,
      means: IndexedSeq[Seq[Double]], idCol: String,
      vecCol: String): DataFrame = {
    val mlit = typedlit(means)
    corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .join(assignments.select(col(idCol), col("cluster")), idCol)
      .withColumn("res", zip_with(col("v"),
        element_at(mlit, col("cluster") + 1), (a, b) => a - b))
  }

  /** Train residual codebooks: PQ over v − μ(cell) for the whole
    * corpus. Persistable (subspace, code, centroid) like
    * [[Pq.fitCodebooks]] — m×k rows of d/m doubles.
    */
  def fitResidualCodebooks(corpus: DataFrame, assignments: DataFrame,
      means: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      m: Int = 16, k: Int = 32, iterations: Int = 3): DataFrame =
    Pq.fitCodebooks(
      residuals(corpus, assignments,
        meanSeq(means, centroidSeq(centroids).size), idCol, vecCol),
      idCol, "res", m, k, iterations)

  /** Encode the corpus: (id, cluster, codes ARRAY<INT>, rnorm DOUBLE)
    * where rnorm = ‖c(cluster) + decode(codes)‖ — the EXACT norm of the
    * served reconstruction, materialized once at encode time so the
    * probe never touches float vectors. One narrow pass after the
    * assignment join.
    */
  def encode(corpus: DataFrame, assignments: DataFrame,
      means: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val ms = meanSeq(means, centroidSeq(centroids).size)
    val books = Pq.collectBooks(codebooks)
    val msSeq = ms.map(_.toSeq)
    val booksSeq = books.map(_.map(_.toSeq).toSeq).toSeq
    // ONE narrow pass after the assignment join (r16): the residual
    // subtraction, the per-subspace argmin, and the recon norm all run
    // fused in two native expressions — the previous form materialized
    // a residual array per row (interpreted zip_with), checkpointed it,
    // projected codes, and JOINED them back to their clusters by id:
    // a second full-corpus shuffle the encode never needed. Values are
    // bit-identical (PqResidualOps scaladoc; IvfPqSpec + the ivfpq
    // fixture oracle pin cluster/codes/rnorm end-to-end).
    corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .join(assignments.select(col(idCol), col("cluster")), idCol)
      // codes materialize at an explode(array(struct)) Generate barrier
      // BEFORE rnorm reads them — otherwise CollapseProject inlines the
      // argmin expression into the rnorm consumer and the whole encode
      // runs twice per row (the Quantize.prepared discipline; measured
      // 2× on the first join-free draft of this pass)
      .select(col(idCol), col("cluster"), explode(array(struct(
        graft.functions.PqResidualAssignCodes.ofColumns(
          col("v"), col("cluster"), msSeq, booksSeq).as("codes")))).as("s"))
      .select(col(idCol), col("cluster"), col("s.codes").as("codes"))
      .withColumn("rnorm", graft.functions.PqReconNorm.ofColumns(
        col("cluster"), col("codes"), msSeq, booksSeq))
      .select(col(idCol), col("cluster"), col("codes"), col("rnorm"))
  }

  /** ADC probe over the IVF-PQ index: queries route to their nProbe
    * nearest cells (same spherical-cosine routing as
    * [[Ann.ivfProbeIndexed]]); each (query, cell) route row carries the
    * constant dot(q, c) and the query's residual-codebook lut, so
    * scoring is cluster-pruned lookups. The probed-cell set is computed
    * driver-side FIRST and pushed as an isin filter, pruning a
    * cluster-partitioned code table to nProbe/nCells of its files.
    */
  def probe(codeTable: DataFrame, centroids: DataFrame, means: DataFrame,
      codebooks: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, kNeighbors: Int,
      nProbe: Int = 4): DataFrame = {
    val spark = codeTable.sparkSession
    val cs = centroidSeq(centroids)
    val ms = meanSeq(means, cs.size)
    val books = Pq.collectBooks(codebooks)
    val m = books.size
    val k = books.head.size
    // the flattened lut indexes as s*k + code: uniform k is load-bearing
    require(books.forall(_.size == k),
      s"codebook subspaces must share one k, got ${books.map(_.size)}")
    val qRows = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("vq"))
      .collect()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("query_id", queries.schema(idCol).dataType),
      StructField("cluster", IntegerType, nullable = false),
      StructField("qcdot", DoubleType, nullable = false),
      StructField("lut", ArrayType(DoubleType), nullable = false),
      StructField("nq", DoubleType, nullable = false)))
    val routeRows = qRows.flatMap { r =>
      val vq = r.getSeq[Double](1)
      val nq = math.sqrt(vq.map(x => x * x).sum)
      require(vq.size % m == 0,
        s"IVF-PQ probe: query dim ${vq.size} is not divisible by m=$m")
      val subDim = vq.size / m
      val lut = (0 until m).flatMap { s =>
        val qs = vq.slice(s * subDim, (s + 1) * subDim)
        books(s).map(c => c.zip(qs).map { case (a, b) => a * b }.sum)
      }
      // route by RAW dot against the cell centroids — bit-identical to
      // [[Ann]].probeRoutes (normalizing q first would reorder within
      // an ulp and could probe different cells; the ranking is
      // invariant to the positive scale, so raw dots ARE the spherical
      // routing). The per-cell score constant is dot(q, μ) — the coarse
      // term of the reconstruction, NOT the routing direction.
      cs.indices
        .map(c => c -> cs(c).zip(vq).map { case (a, b) => a * b }.sum)
        .sortBy { case (c, d) => (-d, c) }
        .take(nProbe)
        .map { case (c, _) =>
          val qc = ms(c).zip(vq).map { case (a, b) => a * b }.sum
          Row(r.get(0), c, qc, lut, nq)
        }
    }
    val routes = spark.createDataFrame(
      spark.sparkContext.parallelize(routeRows.toIndexedSeq, 1), schema)
    val probedCells = routeRows.map(_.getInt(1)).distinct
    val scored = codeTable
      .select(col(idCol).as("neighbor_id"), col("cluster"), col("codes"),
        col("rnorm"))
      .filter(col("cluster").isin(probedCells: _*))
      .join(broadcast(routes), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // native codegen lookup-sum — same swap as [[Pq.adcTopK]] (the
      // r16 bimodal-kernel note's structural fix); bit-identical fold
      .withColumn("adc_dot", col("qcdot") +
        graft.functions.AdcLookupSum.ofColumns(col("codes"), col("lut"), k))
      // zero-norm guard: same convention as [[Pq.adcTopK]]
      .withColumn("cosine",
        when(col("rnorm") * col("nq") > 0.0,
          col("adc_dot") / (col("rnorm") * col("nq"))).otherwise(lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
