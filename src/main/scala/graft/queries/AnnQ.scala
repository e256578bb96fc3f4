package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ann.Ann

/** Similarity-search queries over the `embeddings` table. The query set
  * is the first 20 vectors (vec_id < 20) — the standard serve-time shape
  * of a small query batch against a large corpus.
  */
object AnnQ {

  private def corpusAndQueries(spark: SparkSession, dir: String) = {
    val e = Tables(spark, dir, "embeddings")
    (e, e.filter(col("vec_id") < 20))
  }

  /** Corpus-adaptive IVF sizing — the standard inverted-file rule:
    * nlist = ⌈√N⌉ keeps cells at ~√N vectors and nProbe = ⌈√nlist⌉
    * lets the scanned fraction nProbe/nlist ≈ N^(−1/4) SHRINK as the
    * corpus grows, so probe work is O(N^(3/4)) per query batch. A
    * constant (nlist, nProbe) instead degenerates to scanning a fixed
    * fraction of the corpus — measured as q_ann_ivfpq_probe's 0.80
    * second-decade exponent at sf10 (BENCH_NOTES r14) while the probe
    * members beside it stayed ≤ 0.2. Floors keep tiny corpora at the
    * historical (16, 4) operating point. The build pays one extra
    * narrow count pass; probes derive nlist from the metadata-sized
    * persisted centroid table, never the corpus.
    */
  private[graft] def ivfNList(corpus: DataFrame): Int =
    math.max(16, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)
  private[graft] def ivfNProbe(nList: Int): Int =
    math.max(4, math.ceil(math.sqrt(nList.toDouble)).toInt)
  private def probeWidth(centroids: DataFrame): Int =
    ivfNProbe(centroids.count().toInt)

  /** Exact cosine top-5 per query — the ANN correctness baseline. */
  def bruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = corpusAndQueries(spark, dir)
    Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
  }

  /** LSH-bucketed approximate top-5 (32 tables × 6 bits — measured 0.81
    * recall@5 on this corpus, whose true neighbors sit at cosine
    * 0.4–0.5 where sign-LSH collides rarely; the parameters trade
    * candidate volume for recall). Rows-only for the driver
    * (approximate by design); AnnSpec pins recall against [[bruteTopK]].
    */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = corpusAndQueries(spark, dir)
    Ann.lshNeighbors(corpus, queries, "vec_id", "embedding", k = 5)
  }

  /** Multi-probe LSH top-5: 8 tables (4× smaller corpus-side index than
    * q_ann_lsh's 32) with Hamming-1 query probing buying the recall
    * back. Rows-only; AnnSpec pins recall + the probe-superset
    * property; the pinned-plane fixture twin hash-matches the probe
    * expansion.
    */
  def lshProbeTopK(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = corpusAndQueries(spark, dir)
    Ann.lshNeighborsMultiprobe(corpus, queries, "vec_id", "embedding", k = 5)
  }

  /** IVF approximate top-5 under the corpus-adaptive [[ivfNList]]
    * sizing (√N cells, √nlist probed → the scanned fraction shrinks
    * with the corpus instead of pinning at a constant). Rows-only;
    * AnnSpec pins recall and determinism at the pinned (16, 4)
    * operating point and saved ≡ fresh at the adaptive one.
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = corpusAndQueries(spark, dir)
    val nList = ivfNList(corpus)
    Ann.ivfNeighbors(corpus, queries, "vec_id", "embedding", k = 5,
      nCentroids = nList, nProbe = ivfNProbe(nList))
  }

  /** Quantized brute-force top-5: exact cosine RANKING over the int8
    * code vectors — the shape a memory-bound 100 TB serving tier runs
    * (4× less to scan than float32; cosine is scale-invariant so the
    * per-vector scale cancels). Code dots are bounded integer sums,
    * exact in doubles, so unlike float ANN this is deterministic enough
    * to hash-match a DuckDB oracle; QuantizeSpec pins its recall vs the
    * float ranking.
    */
  def bruteTopKQuantized(spark: SparkSession, dir: String): DataFrame = {
    val coded = graft.ann.Quantize.codes(
      Tables(spark, dir, "embeddings"), "vec_id", "embedding")
    Ann.bruteForceTopK(coded, coded.filter(col("vec_id") < 20),
      "vec_id", "qv", k = 5)
  }

  /** q_stream_ann_serve: the streaming quantized-ANN serving sink run
    * end-to-end — the corpus persisted as the int8 code table, then the
    * batch twin's query set ([[bruteTopKQuantized]]'s `vec_id < 20`)
    * arriving as a FLOAT-vector `readStream` through
    * [[graft.streaming.Streaming.annServeSink]]'s foreachBatch
    * quantize-and-rank into a (query_id, rank)-keyed parquet upsert
    * (`Trigger.AvailableNow`), and the served table read back. Shares
    * q_ann_topk_quant's DuckDB oracle VERBATIM — code dots are exact
    * integer sums, so stream-served ≡ batch ranking is hash-matchable,
    * promoting the serving sink into the oracled ledger. The state dir
    * is wiped per run so the verified artifact is the serve path, not
    * the keyed upsert's redelivery no-op (which StreamingSpec pins
    * separately with a real redelivered batch).
    */
  def streamAnnServe(spark: SparkSession, dir: String): DataFrame = {
    val state = graft.ops.StageArtifacts.refresh(dir, "stream-ann-serve") { out =>
      graft.ops.StageArtifacts.wipeDir(out)
      graft.ann.Quantize.codes(
          Tables(spark, dir, "embeddings"), "vec_id", "embedding")
        .write.parquet(s"$out/codes")
      val queries = Tables.streamEmbeddings(spark, dir)
        .filter(col("vec_id") < 20)
      val q = graft.streaming.Streaming.annServeSink(
          queries, s"$out/codes", s"$out/served")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    spark.read.parquet(s"$state/served")
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Build + persist the IVF index artifact: centroids and
    * cluster-partitioned assignments, the layout [[graft.ann.Ann.ivfProbeIndexed]]
    * prunes against.
    */
  private def buildIvfIndex(spark: SparkSession, dir: String)(out: String): Unit = {
    val corpus = Tables(spark, dir, "embeddings")
    Ann.ivfCentroids(corpus, "vec_id", "embedding",
        nCentroids = ivfNList(corpus))
      .write.mode("overwrite").parquet(s"$out/centroids")
    Ann.ivfAssignments(corpus, "vec_id", "embedding",
      spark.read.parquet(s"$out/centroids"))
      // repartition BY THE PARTITION COLUMN before the partitioned
      // write: without it every shuffle task writes a sliver into
      // every cell dir — nlist × tasks tiny files (~22k at sf10) whose
      // open/listing overhead dominates the pruned probe scan. With it
      // each cell lands in exactly one task → one file per cell, the
      // layout a 100 TB index needs.
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$out/assignments")
  }

  private def probeIvfIndex(spark: SparkSession, dir: String,
      idx: String): DataFrame = {
    val (corpus, queries) = corpusAndQueries(spark, dir)
    val centroids = spark.read.parquet(s"$idx/centroids")
    Ann.ivfProbeIndexed(corpus, spark.read.parquet(s"$idx/assignments"),
      centroids, queries,
      "vec_id", "embedding", k = 5, nProbe = probeWidth(centroids))
  }

  /** The IVF INDEXING path: build the index, persist centroids +
    * cluster-partitioned assignments as parquet, load, probe — times the
    * full build+persist+probe pipeline (rebuilds every call). Same
    * result as [[ivfTopK]] (AnnSpec pins saved ≡ fresh). The artifact
    * dir is managed per JVM (removed at exit), not leaked.
    */
  def ivfTopKIndexed(spark: SparkSession, dir: String): DataFrame =
    probeIvfIndex(spark, dir,
      graft.ops.StageArtifacts.refresh(dir, "ivf")(buildIvfIndex(spark, dir)))

  /** The IVF SERVING path: probe-only against the PREBUILT index (built
    * at most once per JVM) — the cost repeated query batches actually
    * pay once the index exists, measured separately from the build.
    * AnnSpec pins probe ≡ fresh [[ivfTopK]].
    */
  def ivfTopKProbe(spark: SparkSession, dir: String): DataFrame =
    probeIvfIndex(spark, dir,
      graft.ops.StageArtifacts.ensure(dir, "ivf")(buildIvfIndex(spark, dir)))

  /** IVF-ADC serving: cell-pruned probe ranking int8 corpus CODES
    * against float queries — both artifacts (index + code table)
    * prebuilt; probe-only timed. AnnSpec pins determinism, cell-routing
    * identity with the float probe, and recall against it.
    */
  def ivfTopKQuantized(spark: SparkSession, dir: String): DataFrame = {
    val (_, queries) = corpusAndQueries(spark, dir)
    val idx = graft.ops.StageArtifacts.ensure(dir, "ivf")(buildIvfIndex(spark, dir))
    val codes = graft.ops.StageArtifacts.ensure(dir, "ivfcodes") { out =>
      graft.ann.Quantize.codes(
        Tables(spark, dir, "embeddings"), "vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$out/codes")
    }
    val centroids = spark.read.parquet(s"$idx/centroids")
    Ann.ivfProbeQuantized(spark.read.parquet(s"$codes/codes"),
      spark.read.parquet(s"$idx/assignments"), centroids,
      queries, "vec_id", "embedding", "qv", k = 5,
      nProbe = probeWidth(centroids))
  }

  /** Build + persist the PQ artifacts: codebooks (m×k rows) and the
    * encoded corpus code table (m 5-bit codes + one norm per vector —
    * ~13× smaller than the float corpus; (m=16, k=32) rather than the
    * classic (8, 16) because this corpus ranks neighbors on razor-thin
    * cosine margins, see BENCH_NOTES: recall@5 measured 0.16 at m=8,
    * 0.38 at (16, 16), 0.50 at (16, 32) — IVF-probe-4 territory at a
    * fraction of its scan) — the serving tier's entire storage
    * footprint.
    */
  private def buildPqIndex(spark: SparkSession, dir: String)(out: String): Unit = {
    val corpus = Tables(spark, dir, "embeddings")
    graft.ann.Pq.fitCodebooks(corpus, "vec_id", "embedding",
      m = 16, k = 32, iterations = 3)
      .write.mode("overwrite").parquet(s"$out/codebooks")
    graft.ann.Pq.encode(corpus, "vec_id", "embedding",
      spark.read.parquet(s"$out/codebooks"))
      .write.mode("overwrite").parquet(s"$out/codes")
  }

  private def adcOverIndex(spark: SparkSession, dir: String,
      idx: String): DataFrame = {
    val (_, queries) = corpusAndQueries(spark, dir)
    graft.ann.Pq.adcTopK(spark.read.parquet(s"$idx/codes"),
      spark.read.parquet(s"$idx/codebooks"), queries,
      "vec_id", "embedding", kNeighbors = 5)
  }

  /** The PQ INDEXING path: train codebooks, encode, persist both, then
    * ADC-probe — times the full build+persist+probe pipeline (rebuilds
    * every call). Rows-only for the driver (k-means quantization is
    * engine-seeded); PqSpec pins ADC ≡ reconstructed-dot, recall vs the
    * float ranking, and run-to-run determinism.
    */
  def pqTopK(spark: SparkSession, dir: String): DataFrame =
    adcOverIndex(spark, dir,
      graft.ops.StageArtifacts.refresh(dir, "pq")(buildPqIndex(spark, dir)))

  /** The PQ SERVING path: ADC probe-only against the PREBUILT code
    * table + codebooks — the per-query-batch cost once the artifacts
    * exist (m LUT lookups per corpus vector; float vectors never load).
    */
  def pqTopKProbe(spark: SparkSession, dir: String): DataFrame =
    adcOverIndex(spark, dir,
      graft.ops.StageArtifacts.ensure(dir, "pq")(buildPqIndex(spark, dir)))

  /** Build + persist the IVF-PQ artifacts on top of the shared IVF
    * index: residual codebooks and the (id, cluster, codes, rnorm)
    * code table, written cluster-partitioned so the probe's isin
    * filter prunes to the probed cells' files.
    */
  private def buildIvfPqIndex(spark: SparkSession, dir: String)(out: String): Unit = {
    val corpus = Tables(spark, dir, "embeddings")
    val ivf = graft.ops.StageArtifacts.ensure(dir, "ivf")(buildIvfIndex(spark, dir))
    val centroids = spark.read.parquet(s"$ivf/centroids")
    val assignments = spark.read.parquet(s"$ivf/assignments")
    graft.ann.IvfPq.cellMeans(corpus, assignments, "vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$out/means")
    val means = spark.read.parquet(s"$out/means")
    graft.ann.IvfPq.fitResidualCodebooks(corpus, assignments, means,
      centroids, "vec_id", "embedding", m = 16, k = 32, iterations = 3)
      .write.mode("overwrite").parquet(s"$out/codebooks")
    graft.ann.IvfPq.encode(corpus, assignments, means, centroids,
      spark.read.parquet(s"$out/codebooks"), "vec_id", "embedding")
      .repartition(col("cluster")) // one file per cell — see buildIvfIndex
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$out/codes")
  }

  private def ivfPqOverIndex(spark: SparkSession, dir: String,
      idx: String): DataFrame = {
    val (_, queries) = corpusAndQueries(spark, dir)
    val ivf = graft.ops.StageArtifacts.ensure(dir, "ivf")(buildIvfIndex(spark, dir))
    val centroids = spark.read.parquet(s"$ivf/centroids")
    graft.ann.IvfPq.probe(spark.read.parquet(s"$idx/codes"),
      centroids,
      spark.read.parquet(s"$idx/means"),
      spark.read.parquet(s"$idx/codebooks"), queries,
      "vec_id", "embedding", kNeighbors = 5,
      nProbe = probeWidth(centroids))
  }

  /** The IVF-PQ INDEXING path: residual codebooks + cluster-partitioned
    * code table built, persisted and probed (rebuilds every call).
    * Rows-only; IvfPqSpec pins ADC ≡ reconstructed-dot, cell-routing
    * identity with the IVF float probe, recall, and determinism.
    */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame =
    ivfPqOverIndex(spark, dir,
      graft.ops.StageArtifacts.refresh(dir, "ivfpq")(buildIvfPqIndex(spark, dir)))

  /** The IVF-PQ SERVING path: doubly-reduced ADC probe (cell pruning ×
    * m-lookup scoring) against prebuilt artifacts — the cost per query
    * batch on a 100 TB vector corpus.
    */
  def ivfPqTopKProbe(spark: SparkSession, dir: String): DataFrame =
    ivfPqOverIndex(spark, dir,
      graft.ops.StageArtifacts.ensure(dir, "ivfpq")(buildIvfPqIndex(spark, dir)))

  /** q_ann_pq_fixture: ADC top-5 over the PINNED fixture corpus and
    * codebooks — the hash-match-oracled twin of the rows-only PQ
    * queries. The engine runs the REAL encode + adcTopK path
    * ([[graft.ann.Pq]], unchanged); DuckDB replays argmin encoding, the
    * LUT sum, rnorm and the ranking from the same pinned integer
    * artifacts, where every intermediate is exact — so a hash match
    * proves the serving math end-to-end, not just row counts.
    */
  def pqFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.ann.PqFixture.corpusDf(spark)
    val books = graft.ann.PqFixture.codebooksDf(spark)
    val codes = graft.ann.Pq.encode(corpus, "vec_id", "embedding", books)
    graft.ann.Pq.adcTopK(codes, books,
      corpus.filter(col("vec_id") < 3), "vec_id", "embedding", kNeighbors = 5)
  }

  /** Build + persist the OPQ artifacts: the [[graft.ann.Opq]] rotation
    * basis from the PCA eigen-allocation, the ROTATED corpus' PQ
    * codebooks, and its code table — the Ge et al. OPQ_P pipeline at
    * the same (m, k) code budget as [[buildPqIndex]], so the measured
    * MSE/recall difference is the rotation's alone.
    */
  private def buildOpqIndex(spark: SparkSession, dir: String)(out: String): Unit = {
    val corpus = Tables(spark, dir, "embeddings")
    val basis = graft.ann.Opq.rotationBasis(corpus, "embedding", m = 16)
    import spark.implicits._
    basis.toSeq.zipWithIndex.map { case (row, j) => (j, row.toSeq) }
      .toDF("row", "basis")
      .write.mode("overwrite").parquet(s"$out/basis")
    val rotated = graft.ann.Opq.rotate(corpus, "vec_id", "embedding", basis)
    graft.ann.Pq.fitCodebooks(rotated, "vec_id", "embedding",
      m = 16, k = 32, iterations = 3)
      .write.mode("overwrite").parquet(s"$out/codebooks")
    graft.ann.Pq.encode(rotated, "vec_id", "embedding",
      spark.read.parquet(s"$out/codebooks"))
      .write.mode("overwrite").parquet(s"$out/codes")
  }

  /** q_ann_opq: OPQ serving — ADC probe in the ROTATED space (queries
    * rotated by the persisted basis; exact cosine is rotation-invariant,
    * so the ranking semantics match q_ann_pq while quantization error
    * drops — PqSpec measures the MSE improvement). Rows-only like the
    * other trained-index members; the rotation+ADC serving arithmetic
    * is hash-matched by the q_ann_opq_fixture twin.
    */
  def opqTopK(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.ops.StageArtifacts.ensure(dir, "opq")(buildOpqIndex(spark, dir))
    val (_, queries) = corpusAndQueries(spark, dir)
    val basis = spark.read.parquet(s"$idx/basis")
      .orderBy(col("row")).collect()
      .map(_.getSeq[Double](1).toArray)
    graft.ann.Pq.adcTopK(spark.read.parquet(s"$idx/codes"),
      spark.read.parquet(s"$idx/codebooks"),
      graft.ann.Opq.rotate(queries, "vec_id", "embedding", basis),
      "vec_id", "embedding", kNeighbors = 5)
  }

  /** Build + persist the OPQ_NP artifacts: identical layout to the
    * parametric index, with the basis produced by the NON-parametric
    * alternation ([[graft.ann.Opq.rotationBasisNp]] — Lloyd in the
    * rotated space, then the orthogonal-Procrustes rotation against
    * the actual quantization error). Same (m, k) code budget as
    * q_ann_pq/q_ann_opq, so the three-way MSE ladder isolates what
    * each refinement buys (PqSpec measures both steps).
    */
  private def buildOpqNpIndex(spark: SparkSession, dir: String)(out: String): Unit = {
    val corpus = Tables(spark, dir, "embeddings")
    val basis = graft.ann.Opq.rotationBasisNp(corpus, "vec_id", "embedding",
      m = 16, k = 32)
    import spark.implicits._
    basis.toSeq.zipWithIndex.map { case (row, j) => (j, row.toSeq) }
      .toDF("row", "basis")
      .write.mode("overwrite").parquet(s"$out/basis")
    val rotated = graft.ann.Opq.rotate(corpus, "vec_id", "embedding", basis)
    graft.ann.Pq.fitCodebooks(rotated, "vec_id", "embedding",
      m = 16, k = 32, iterations = 3)
      .write.mode("overwrite").parquet(s"$out/codebooks")
    graft.ann.Pq.encode(rotated, "vec_id", "embedding",
      spark.read.parquet(s"$out/codebooks"))
      .write.mode("overwrite").parquet(s"$out/codes")
  }

  /** q_ann_opq_np: OPQ_NP serving — the same rotate-queries + ADC
    * probe as [[opqTopK]] over the non-parametrically refined basis.
    * Serving cost is identical to q_ann_opq (the refinement is all in
    * the once-per-corpus-version train); the rows-only member leans on
    * q_ann_opq_fixture for the rotate+encode+ADC arithmetic and on
    * PqSpec's NP gate (MSE strictly below the parametric variant,
    * bit-deterministic train) for the optimization claim.
    */
  def opqNpTopK(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.ops.StageArtifacts.ensure(dir, "opq_np")(buildOpqNpIndex(spark, dir))
    val (_, queries) = corpusAndQueries(spark, dir)
    val basis = spark.read.parquet(s"$idx/basis")
      .orderBy(col("row")).collect()
      .map(_.getSeq[Double](1).toArray)
    graft.ann.Pq.adcTopK(spark.read.parquet(s"$idx/codes"),
      spark.read.parquet(s"$idx/codebooks"),
      graft.ann.Opq.rotate(queries, "vec_id", "embedding", basis),
      "vec_id", "embedding", kNeighbors = 5)
  }

  /** q_ann_opq_fixture: the ROTATED-SERVING twin of [[pqFixtureTopK]] —
    * the real [[graft.ann.Opq.rotate]] + [[graft.ann.Pq]] encode/ADC
    * (all unchanged) with a PINNED signed-permutation rotation
    * (orthonormal, integer — y_j = ±x_{π(j)}), so corpus, queries,
    * argmin codes, LUT sums and ranking stay exact end-to-end and
    * DuckDB replays the whole rotate-then-serve path. The learned-basis
    * member (q_ann_opq) leans on this twin for its serving arithmetic
    * and on PqSpec for the rotation-optimality claim.
    */
  def opqFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.ann.PqFixture
    val corpus = graft.ann.Opq.rotate(fx.corpusDf(spark), "vec_id",
      "embedding", fx.opqRotation)
    val books = fx.codebooksDf(spark)
    val codes = graft.ann.Pq.encode(corpus, "vec_id", "embedding", books)
    graft.ann.Pq.adcTopK(codes, books,
      corpus.filter(col("vec_id") < 3), "vec_id", "embedding", kNeighbors = 5)
  }

  /** q_ann_ivfpq_fixture: the IVF-PQ twin of [[pqFixtureTopK]] — the
    * real residual encode + doubly-reduced ADC probe
    * ([[graft.ann.IvfPq]], unchanged) over pinned integer artifacts
    * (routing centroids, cell means, residual codebooks, assignments),
    * DuckDB replaying routing, residual encoding, qcdot + LUT scoring
    * and ranking exactly.
    */
  def ivfPqFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.ann.PqFixture
    val corpus = fx.corpusDf(spark)
    val codeTable = graft.ann.IvfPq.encode(corpus, fx.assignmentsDf(spark),
      fx.meansDf(spark), fx.centroidsDf(spark), fx.codebooksDf(spark),
      "vec_id", "embedding")
    graft.ann.IvfPq.probe(codeTable, fx.centroidsDf(spark),
      fx.meansDf(spark), fx.codebooksDf(spark),
      corpus.filter(col("vec_id") < 3), "vec_id", "embedding",
      kNeighbors = 5, nProbe = 2)
  }

  /** q_ann_ivf_fixture: the ROUTING twin of [[pqFixtureTopK]] — the real
    * persisted-index probe path ([[graft.ann.Ann.ivfProbeIndexed]],
    * unchanged: driver-side route table, isin cell pruning, per-cell
    * rank join) over pinned integer centroids and assignments. Every
    * routing dot and cosine is exact arithmetic, so DuckDB replays cell
    * choice (raw dot desc, cluster asc), candidate membership, ranking
    * and the rounded cosine — closing the "trust the spec" gap on the
    * q_ann_ivf* family's cell-routing serve math.
    */
  def ivfFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.ann.PqFixture
    val corpus = fx.corpusDf(spark)
    Ann.ivfProbeIndexed(corpus, fx.assignmentsDf(spark),
      fx.centroidsDf(spark), corpus.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, nProbe = 2)
  }

  /** q_ann_ivfadc_fixture: the QUANTIZED-SERVING twin of
    * [[ivfFixtureTopK]] — the real [[graft.ann.Ann.ivfProbeQuantized]]
    * (unchanged: driver-side route table, isin cell pruning, int8-ADC
    * rank join) with the corpus codes from the real
    * [[graft.ann.Quantize.codes]] over the pinned integer fixture.
    * Every step replays in DuckDB: per-vector scale = max|v|/127,
    * floor-half-up clamped codes, raw-dot cell routing, and the
    * asymmetric cosine dot(codes, float query)/(‖codes‖·‖q‖) — closing
    * the one ANN serving path (q_ann_ivf_quant) that had no
    * hash-matched fixture twin of its own.
    */
  def ivfAdcFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.ann.PqFixture
    val corpus = fx.corpusDf(spark)
    Ann.ivfProbeQuantized(
      graft.ann.Quantize.codes(corpus, "vec_id", "embedding"),
      fx.assignmentsDf(spark), fx.centroidsDf(spark),
      corpus.filter(col("vec_id") < 3),
      "vec_id", "embedding", "qv", k = 5, nProbe = 2)
  }

  /** q_ann_mmr_fixture: the GREEDY-LOOP twin of q_ann_mmr — the real
    * [[graft.ann.Mmr.rerank]] (unchanged) over pinned integer
    * relevances and the fixture corpus' integer vectors, λ = 0.25
    * (exactly representable, as is 1−λ). DuckDB replays the k selection
    * steps as unrolled CTEs; the pinned duplicates (ids 0/9, 1/10,
    * 2/11 share vectors) force the redundancy term to visibly reorder
    * the selection vs pure relevance.
    */
  def mmrFixtureTopK(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Mmr.rerank(spark, graft.ann.MmrFixture.candidatesDf(spark),
      graft.ann.PqFixture.corpusDf(spark), "vec_id", "embedding",
      k = graft.ann.MmrFixture.k, lambda = graft.ann.MmrFixture.lambda)

  /** q_ann_lsh_fixture: the BUCKET/CANDIDATE/RE-RANK twin of q_ann_lsh
    * — the real [[graft.ann.Ann.lshNeighborsPlanes]] (unchanged; the
    * seeded production path delegates to it) over the PINNED integer
    * plane tensor of [[graft.ann.LshFixture]]. Integer plane·vector
    * dots are exact in DOUBLE, so DuckDB replays bucket signs, the
    * (table, bucket) candidate join, self-exclusion, exact cosines and
    * the (cosine desc, neighbor_id) ranking — a hash match proves the
    * whole LSH serve path, closing the last trust-the-spec gap in the
    * ANN family.
    */
  def lshFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.ann.LshFixture
    val corpus = fx.corpusDf(spark)
    Ann.lshNeighborsPlanes(corpus, corpus.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = fx.k, planeTensor = fx.planeTensor)
  }

  /** q_ann_lsh_probe_fixture: the MULTI-PROBE twin of
    * [[lshFixtureTopK]] — the same pinned planes with every Hamming-1
    * bucket probed (probeBits = bitsPerTable); DuckDB replays the
    * probe expansion (bucket XOR each bit) plus the candidate join and
    * ranking exactly, so the probing path is hash-match oracled, not
    * just property-pinned.
    */
  def lshProbeFixtureTopK(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.ann.LshFixture
    val corpus = fx.corpusDf(spark)
    Ann.lshNeighborsPlanes(corpus, corpus.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = fx.k, planeTensor = fx.planeTensor,
      probeBits = fx.bitsPerTable)
  }

  /** q_ann_recall_report: the approximate-vs-exact RECALL LEDGER — one
    * oracled dashboard relation auditing every approximate ANN family's
    * serve path at once. Each hash-match-oracled fixture method (IVF
    * cell routing, IVF-PQ residual ADC, single- and multi-probe LSH,
    * plain PQ ADC) runs its REAL serve code over the pinned fixture
    * corpus; its top-5 is joined against the exact brute-force top-5 on
    * the same corpus, and per (method, query) the report emits hits@5
    * and recall@5 (n/5 — exactly representable). The DuckDB oracle
    * recomputes every method's result from the SAME fixture oracle SQL
    * the individual q_ann_*_fixture rows use, plus the exact ranking —
    * so the recall numbers themselves are hash-matched, turning the
    * "approximate by design, twinned" no-oracle entries into one
    * auditable CORRECTNESS row.
    */
  def annRecallReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val fx = graft.ann.PqFixture
    val corpus = fx.corpusDf(spark)
    val exact = Ann.bruteForceTopK(corpus, corpus.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val methods: Seq[(String, DataFrame)] = Seq(
      "ivf" -> ivfFixtureTopK(spark, dir),
      "ivfadc" -> ivfAdcFixtureTopK(spark, dir),
      "ivfpq" -> ivfPqFixtureTopK(spark, dir),
      "lsh" -> lshFixtureTopK(spark, dir),
      "lsh_probe" -> lshProbeFixtureTopK(spark, dir),
      "opq" -> opqFixtureTopK(spark, dir),
      "pq" -> pqFixtureTopK(spark, dir))
    methods.map { case (name, df) =>
      df.select(lit(name).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("method"), col("query_id"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .withColumn("recall_at_5", col("n_hits").cast("double") / lit(5.0))
  }

  /** q_hard_negatives: for each query vector, the top-5 most-similar
    * vectors that are NOT in its near-dup cluster — the hard-negative
    * mining step of contrastive embedding training (a near-duplicate is
    * a false negative that poisons the loss; the best negatives are
    * similar-but-distinct). Composes the exact cosine ranking with the
    * embed-cluster closure; fully oracled (cosine + recursive-CTE
    * closure + one window).
    *
    * Scale: the cosine scan is the ANN-serving shape (broadcast query
    * batch, corpus streamed once, any indexed variant substitutes);
    * cluster labels join on the id key both sides.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    hardNegativesFrom(spark, dir,
      graft.dedup.Dedup.clusterLabels(Tables(spark, dir, "embeddings"),
          "vec_id",
          graft.dedup.Dedup.cosinePairsBlocked(
            Tables(spark, dir, "embeddings"), "vec_id", "embedding",
            threshold = 0.4).select(col("a_id"), col("b_id")))
        .select(col("doc_id").as("vec_id"), col("cluster_id")))

  /** [[hardNegatives]] composed from the prebuilt embedding-cluster
    * artifact — same oracle; mining pays the scoring scan + two id-keyed
    * joins, not the pair scan + closure (which ships in the artifact).
    */
  def hardNegativesCompose(spark: SparkSession, dir: String): DataFrame =
    hardNegativesFrom(spark, dir,
      DedupQ.embedClustersFromArtifact(spark, dir))

  private def hardNegativesFrom(spark: SparkSession, dir: String,
      clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir, "embeddings")
    // the un-ranked scoring scan — ranking happens ONCE, after the
    // cluster exclusion, so the window sees only true negatives (and
    // the widest intermediate is never sorted twice). Cosine rounds to
    // the output precision BEFORE ranking, mirroring the oracle.
    val scored = Ann.scoreAll(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding")
      .withColumn("cosine", round(col("cosine"), 6))
    val qc = clusters.select(col("vec_id").as("query_id"),
      col("cluster_id").as("qc"))
    val nc = clusters.select(col("vec_id").as("neighbor_id"),
      col("cluster_id").as("nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.join(qc, "query_id").join(nc, "neighbor_id")
      .filter(col("qc") =!= col("nc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"))
  }

  /** q_ann_mmr: MMR-diversified top-10 from the brute top-20 candidate
    * list for query vector 0 (λ = 0.7). Candidate generation is the
    * distributed stage; the greedy rerank is k-sized serving logic.
    */
  def mmrTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cands = Ann.bruteForceTopK(emb,
        emb.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 20)
      .select(col("neighbor_id").as("doc_id"), col("cosine"))
    graft.ann.Mmr.rerank(spark, cands, emb, "vec_id", "embedding",
      k = 10, lambda = 0.7)
  }
}
