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
  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** L2 norm via the native index-order dot (cross-engine deterministic). */
  private def l2(v: Column): Column = sqrt(dot(v, v))

  /** Index-order dot product of two double arrays — the native codegen'd
    * [[graft.functions.ArrayDotProduct]]; bit-identical to the
    * `aggregate(zip_with(...))` fold it replaced.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.ofColumns(a, b)

  /** Exact cosine top-`k` neighbors per query. `queries` must be small
    * enough to broadcast (the usual ANN-serving shape); self-matches are
    * excluded by id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scoreAll(corpus, queries, idCol, vecCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** The un-ranked scoring scan behind [[bruteForceTopK]]:
    * (query_id, neighbor_id, cosine) for every (query, corpus) pair,
    * self-matches excluded. Consumers that filter BEFORE ranking
    * (hard-negative mining) start here instead of paying
    * bruteForceTopK's per-query sort twice.
    */
  def scoreAll(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    // FanOut: the per-(query, corpus-row) dot is THE serving cost — a
    // single-split corpus file must not score on one core
    val c = graft.ops.FanOut(corpus).select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("vc"))
      .withColumn("nc", l2(col("vc")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("vq"))
      .withColumn("nq", l2(col("vq")))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("vc"), col("vq")) / (col("nc") * col("nq")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** (neighbor_id, v, norm nc, unit vn) projection shared by the IVF
    * build/assign/probe stages.
    */
  private def prepIvf(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nc", l2(col("v")))
      .withColumn("vn", transform(col("v"), x => x / col("nc")))

  /** Argmax-cosine cluster assignment against a driver-side centroid
    * matrix (shipped as one literal): fold over centroids, native dot
    * per cell, no explode. The ONE assignment definition every IVF path
    * (train, fresh-build, persisted-index) shares, so a corpus assigned
    * at build time and a batch assigned at serve time land in the same
    * cells — like [[graft.dedup.Dedup.minhashIndex]]'s banding, the
    * assignment is a persistence contract, not an implementation detail.
    */
  private def assignExpr(cs: Seq[Seq[Double]]): Column =
    // native argmax loop (r16): the aggregate-over-cells HOF fold paid
    // an interpreted dispatch + struct allocation per (row, cell) —
    // ~√N of them per row on the full assignment pass; arithmetic,
    // tie-breaks and degenerate-input outcomes are bit-identical
    // (ArgmaxDotIndex scaladoc; ArgmaxDotIndexSpec differential)
    graft.functions.ArgmaxDotIndex.ofColumn(col("vn"), cs)

  /** Driver-coordinated spherical k-means over a prepared (checkpointed)
    * corpus frame: init = the `nCentroids` vectors with the smallest
    * xxhash64(id) (deterministic, data-independent order), then Lloyd
    * iterations. Each iteration is ONE fused job: assignment feeds a
    * single groupBy(cluster) with `dim` elementwise sum aggregates plus
    * a count — map-side combinable, shuffling only nCentroids×(dim+1)
    * doubles. (The previous form posexploded corpus×dim rows per
    * iteration — the r3 bench measured it 2.1× slower at sf0.1, and the
    * dim-fold scan amplification is exactly what must not happen at
    * 100 TB.) Everything is seeded/orderless, so results are
    * reproducible run to run.
    */
  private def fitCentroids(cv: DataFrame, nCentroids: Int,
      iterations: Int): Seq[Seq[Double]] = {
    var centroids: Seq[Seq[Double]] = cv
      .orderBy(xxhash64(col("neighbor_id")))
      .limit(nCentroids)
      .select("vn").collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    if (centroids.isEmpty) return centroids
    val dim = centroids.head.size
    for (_ <- 1 to iterations) {
      val sumCols = (0 until dim).map(j =>
        sum(element_at(col("vn"), j + 1)).as(s"s$j"))
      val rows = cv.withColumn("cluster", assignExpr(centroids))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
      val byCluster = rows.map(r => r.getInt(0) -> r).toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        byCluster.get(c) match {
          case None => old // empty cell keeps its centroid
          case Some(r) =>
            val n = r.getLong(1).toDouble
            val mean = (0 until dim).map(j => r.getDouble(2 + j) / n)
            val norm = math.sqrt(mean.map(x => x * x).sum)
            if (norm == 0.0) old else mean.map(_ / norm)
        }
      }
    }
    centroids
  }

  /** The persistable IVF CENTROID table — (cluster INT, centroid
    * ARRAY<DOUBLE>), metadata-sized. Build once, write to parquet, and
    * serving loads it instead of re-running k-means per query batch
    * (the build/probe split [[ivfAssignments]] + [[ivfProbeIndexed]]
    * complete; AnnSpec proves saved-index probes ≡ fresh-build probes).
    *
    * TRAINING SAMPLE (r15): with the corpus-adaptive nlist = ⌈√N⌉,
    * full-corpus Lloyd passes cost N·√N dots each — an N^1.5 build
    * term (measured: q_ann_ivfpq build 6.1 → 11.2 s at sf0.1 alone).
    * Centroid QUALITY needs O(nCentroids · trainPerCell) evidence, not
    * the whole corpus, so Lloyd trains on a deterministic content-hash
    * sample of every d-th vector (d = ⌊N / (nCentroids·trainPerCell)⌋,
    * xxhash64 on the id — seedless, reproducible, engine-side only:
    * centroids are no one's oracle), and only the SINGLE final
    * assignment pass ([[ivfAssignments]]) touches all N rows.
    * trainPerCell = 64 keeps ~64 training vectors per cell (inside the
    * 39–256/cell band the FAISS guidelines publish); corpora under
    * 2 × nCentroids·trainPerCell train unsampled (d = 1 — every
    * testdata recall gate unchanged).
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, iterations: Int = 3,
      trainPerCell: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = math.max(1L,
      corpus.count() / (nCentroids.toLong * trainPerCell))
    val trainSrc = if (d <= 1L) corpus
      else corpus.filter(pmod(xxhash64(col(idCol)), lit(d)) === 0)
    // the barrier materializes (id, v, norm, vn) ONCE: the k-means
    // loop runs one action per iteration, and without it the normalize
    // pipeline would re-inline into each of the nCentroids argmax fold
    // steps of every action (measured 10x slower)
    val cv = graft.ops.Barrier.once(prepIvf(trainSrc, idCol, vecCol))
    val cs = fitCentroids(cv, nCentroids, iterations)
    graft.ops.Barrier.release(cv)
    cs.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
  }

  /** Load a centroid table back into the driver-side matrix. */
  private def centroidSeq(centroids: DataFrame): Seq[Seq[Double]] =
    centroids.select(col("cluster"), col("centroid")).orderBy(col("cluster"))
      .collect().map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq

  /** The persistable IVF ASSIGNMENT table — (id, cluster), one narrow
    * pass over the corpus. At scale this is written partitioned by
    * `cluster` so a probe reads only its nProbe cells' files.
    */
  def ivfAssignments(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cs = centroidSeq(centroids)
    // FanOut the assignment map (per-row argmax vs a fixed centroid
    // literal — partitioning-invariant); the TRAINING path (ivfCentroids)
    // is deliberately NOT fanned: its Lloyd float sums must stay
    // reproducible against stream-vs-batch equality pins
    prepIvf(graft.ops.FanOut(corpus), idCol, vecCol)
      .select(col("neighbor_id").as(idCol), assignExpr(cs).as("cluster"))
  }

  /** Probe a prebuilt IVF index: corpus rows joined to their persisted
    * cluster assignment, queries routed to their `nProbe` nearest cells.
    * No k-means pass — the serving shape for repeated query batches.
    *
    * The probed cell set is computed on the driver FIRST and pushed as
    * an `isin` filter on the assignment table, so when assignments are
    * written `partitionBy("cluster")` the scan prunes to the probed
    * cells' files — the query batch touches nProbe/nCentroids of the
    * index and, through the semi-join, of the corpus. That filter-first
    * shape is the entire point of an IVF layout at 100 TB.
    */
  def ivfProbeIndexed(corpus: DataFrame, assignments: DataFrame,
      centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val routes = probeRoutes(queries, idCol, vecCol,
      centroidSeq(centroids), nProbe)
    // cells from the SAME routes the rank join uses — a second,
    // hand-rolled cell computation could drift from the routing and
    // silently prune cells queries are still routed to
    val probedCells = routes.rows.map(_.getInt(1)).distinct
    val probedAssignments = assignments
      .select(col(idCol).as("neighbor_id"), col("cluster"))
      .filter(col("cluster").isin(probedCells: _*))
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nc", l2(col("v")))
      .join(probedAssignments, "neighbor_id")
    probeCells(assigned, routes, k)
  }

  /** IVF-ADC: the cell-pruned probe over int8 CORPUS codes with FLOAT
    * queries — asymmetric distance computation, the standard
    * memory-bound vector-serving composition (coarse quantizer prunes
    * cells, scalar-quantized codes cut the in-cell scan 4×, the query
    * stays full-precision so only corpus-side rounding costs recall).
    * Routing uses the float centroids (exactly [[ivfProbeIndexed]]'s
    * routes), ranking divides by each side's own norm, so cosine is
    * scale-free on the code side. The serving tier stores ONLY codes +
    * assignments + centroids — float corpus vectors never load.
    */
  def ivfProbeQuantized(corpusCodes: DataFrame, assignments: DataFrame,
      centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, codeCol: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    val routes = probeRoutes(queries, idCol, vecCol,
      centroidSeq(centroids), nProbe)
    val probedCells = routes.rows.map(_.getInt(1)).distinct
    val probedAssignments = assignments
      .select(col(idCol).as("neighbor_id"), col("cluster"))
      .filter(col("cluster").isin(probedCells: _*))
    val assigned = corpusCodes
      .select(col(idCol).as("neighbor_id"), asDouble(col(codeCol)).as("v"))
      .withColumn("nc", l2(col("v")))
      .join(probedAssignments, "neighbor_id")
    probeCells(assigned, routes, k)
  }

  /** The driver-side probe routing: per query, one row per probed cell
    * — (query_id, cluster, vq, nq) for the `nProbe` nearest centroids.
    * The ONE definition both the assignment-scan pruning and the rank
    * join consume.
    */
  private final case class ProbeRoutes(
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row])

  private def probeRoutes(queries: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], nProbe: Int): ProbeRoutes = {
    val qPrep = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("vq"))
      .withColumn("nq", l2(col("vq")))
    // keep the id's ORIGINAL value and type (string ids must work, and
    // query_id's output type must match bruteForceTopK/lshNeighbors)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("query_id", qPrep.schema("query_id").dataType),
      StructField("cluster", IntegerType, nullable = false),
      StructField("vq", ArrayType(DoubleType)),
      StructField("nq", DoubleType, nullable = false)))
    val rows = qPrep.collect().toSeq.flatMap { r =>
      val qid = r.get(0)
      val vq = r.getSeq[Double](1)
      val nq = r.getDouble(2)
      centroids.zipWithIndex
        .map { case (c, i) => i -> c.zip(vq).map { case (a, b) => a * b }.sum }
        .sortBy { case (i, d) => (-d, i) }
        .take(nProbe)
        .map { case (i, _) => Row(qid, i, vq, nq) }
    }
    ProbeRoutes(schema, rows)
  }

  /** Rank queries against their probe cells. `assigned` must carry
    * (neighbor_id, v, nc, cluster).
    */
  private def probeCells(assigned: DataFrame, routes: ProbeRoutes,
      k: Int): DataFrame = {
    val spark = assigned.sparkSession
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(routes.rows, 1), routes.schema)
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("v"), col("vq")) / (col("nc") * col("nq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** IVF (inverted-file) ANN, fresh-build form: a spherical k-means
    * coarse quantizer splits the corpus into `nCentroids` cells; a query
    * scans only its `nProbe` nearest cells. At corpus scale the
    * assignment is the only full pass and search cost drops by
    * ~nCentroids/nProbe; cells are the natural partitioning key for a
    * 100 TB vector table. Train/assign/probe all go through the same
    * definitions as the persisted-index path ([[ivfCentroids]] /
    * [[ivfAssignments]] / [[ivfProbeIndexed]]), so fresh-build and
    * saved-index results are identical.
    */
  def ivfNeighbors(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iterations: Int = 3): DataFrame = {
    val cv = graft.ops.Barrier.once(prepIvf(corpus, idCol, vecCol))
    val centroids = fitCentroids(cv, nCentroids, iterations)
    val assigned = cv.withColumn("cluster", assignExpr(centroids))
    // materialize the (tiny, |Q|×k) result so the barriered corpus
    // working set can be released instead of staying pinned for the
    // session lifetime
    val result = graft.ops.Barrier.once(probeCells(assigned,
      probeRoutes(queries, idCol, vecCol, centroids, nProbe), k))
    graft.ops.Barrier.release(cv)
    result
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

  /** LSH-bucketed approximate top-`k`: candidates are corpus rows that
    * share any table's full bucket with the query, then exact cosine +
    * ranking on candidates only. Output shape matches
    * [[bruteForceTopK]]; recall < 1 by design (see AnnSpec for the
    * measured recall/candidate trade-off on the testdata).
    *
    * Plan shape: the plane tensor ships as ONE array literal and buckets
    * are computed by per-table folds after an explode barrier — an
    * earlier version unrolled tables×bits×dim expression nodes, which
    * ballooned the plan to tens of MB and spent minutes in codegen.
    */
  def lshNeighbors(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      tables: Int = 32, bitsPerTable: Int = 6, dim: Int = -1,
      seed: Long = 42L): DataFrame = {
    // dim <= 0 → infer from the data: a plane/vector length mismatch
    // would null every dot product, landing ALL rows in bucket 0 and
    // silently degrading the bucket join to a full cross product
    val d = if (dim > 0) dim
    else corpus.select(size(col(vecCol))).head().getInt(0)
    lshNeighborsPlanes(corpus, queries, idCol, vecCol, k,
      (0 until tables).map(t => planes(seed + t, bitsPerTable, d)))
  }

  /** Multi-probe [[lshNeighbors]]: FEWER tables (default 8 vs 32) with
    * Hamming-1 query-side probing — the corpus-side index cost drops 4×
    * (the term that scales with corpus size) while probing recovers the
    * recall the dropped tables provided. AnnSpec pins recall and the
    * probe-superset property on the testdata.
    */
  def lshNeighborsMultiprobe(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      tables: Int = 8, bitsPerTable: Int = 6, probeBits: Int = 6,
      dim: Int = -1, seed: Long = 42L): DataFrame = {
    val d = if (dim > 0) dim
    else corpus.select(size(col(vecCol))).head().getInt(0)
    lshNeighborsPlanes(corpus, queries, idCol, vecCol, k,
      (0 until tables).map(t => planes(seed + t, bitsPerTable, d)),
      probeBits = probeBits)
  }

  /** [[lshNeighbors]] with an EXPLICIT plane tensor [table][bit][dim] —
    * the ONE definition of the bucket/candidate/re-rank serve path,
    * which the seeded production form above delegates to and the
    * q_ann_lsh_fixture oracle replays over pinned integer planes
    * (integer dots are exact in DOUBLE, so bucket signs, candidate
    * membership, cosines and ranking all hash-match DuckDB).
    */
  def lshNeighborsPlanes(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planeTensor: Seq[Seq[Seq[Double]]]): DataFrame =
    lshNeighborsPlanes(corpus, queries, idCol, vecCol, k, planeTensor,
      probeBits = 0)

  /** [[lshNeighborsPlanes]] with MULTI-PROBE: the query side also
    * probes, per table, every bucket at Hamming distance 1 from its own
    * (the `probeBits` lowest sign bits flipped) — the standard
    * multi-probe LSH trade (Lv et al., VLDB'07): a near-boundary query
    * whose neighbor landed one sign-flip away is recovered WITHOUT
    * adding tables, so the corpus-side cost (L bucket computations +
    * index entries per row, the term that matters at 100 TB) stays
    * fixed while recall rises; only the broadcast-side query rows
    * multiply (×(probeBits+1), still queries-sized). `probeBits = 0`
    * is exactly the single-probe path. Candidate membership stays a
    * (table, bucket) equi-join; the exact re-rank is unchanged, so
    * probing can only ADD true candidates — AnnSpec pins the superset
    * and recall-monotonicity properties, and the pinned-plane fixture
    * twin hash-matches the full probe expansion in DuckDB.
    */
  def lshNeighborsPlanes(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planeTensor: Seq[Seq[Seq[Double]]], probeBits: Int): DataFrame = {
    require(planeTensor.nonEmpty && planeTensor.head.nonEmpty,
      "planeTensor must have at least one table of at least one plane")
    require(probeBits >= 0 && probeBits <= planeTensor.head.size,
      s"probeBits $probeBits outside [0, ${planeTensor.head.size}]")
    val tables = planeTensor.size
    def withBuckets(df: DataFrame, id: String): DataFrame = {
      // explode the table axis first: v materializes once per (row,
      // table) at the Generate node, then the native bucket loop runs
      // on top of it (r16 — the aggregate-over-bits HOF fold it
      // replaces is bit-identical; SignLshBucketSpec differential)
      df.select(col(id), col("v"),
        explode(sequence(lit(0), lit(tables - 1))).as("table"))
        .withColumn("bucket", graft.functions.SignLshBucket.ofColumns(
          col("v"), col("table"), planeTensor))
    }
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("v"))
    val qv = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("v"))
    val cb = withBuckets(cv, "neighbor_id").drop("v")
    val qb0 = withBuckets(qv, "query_id").drop("v")
    // probe expansion (query side only): own bucket + each of the
    // probeBits single-bit flips
    val qb =
      if (probeBits == 0) qb0
      else qb0.withColumn("bucket", explode(array(
        col("bucket") +: (0 until probeBits).map(b =>
          col("bucket").bitwiseXOR(lit(1L << b))): _*)))
    val candidates = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(cv.withColumn("nc", l2(col("v"))), "neighbor_id")
      .join(broadcast(qv.select(col("query_id"), col("v").as("vq"))
        .withColumn("nq", l2(col("vq")))), "query_id")
      .withColumn("cosine", dot(col("v"), col("vq")) / (col("nc") * col("nq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
