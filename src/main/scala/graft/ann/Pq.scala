package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) serving —
  * the other classic vector-compression family next to
  * [[Quantize]]'s scalar int8: split each d-dim vector into `m`
  * subvectors, k-means each subspace to `k` centroids, store only the
  * m code bytes per vector (d=64, m=8, k=16 → 8 codes ≈ 32× smaller
  * than float32, vs int8's fixed 4×). A query stays full-precision:
  * per query one m×k lookup table of subspace dots is computed on the
  * driver and shipped as a literal, so scoring a corpus vector is m
  * table lookups — no float vector ever loads at serve time.
  *
  * Scale shape: codebook training is driver-coordinated Lloyd like
  * [[Ann.ivfCentroids]], but ALL m subspaces train in the SAME fused
  * job per iteration (one pass over the corpus, one map-side-combinable
  * groupBy((subspace, code)) shuffling only m×k×(d/m+1) doubles);
  * encoding is one narrow pass; serving is a broadcast of |Q| LUT rows
  * against the code table. Nothing corpus-sized is collected,
  * broadcast, or shuffled anywhere.
  *
  * Everything is seeded/orderless-deterministic: init centroids are the
  * k corpus vectors with the smallest xxhash64(id), iteration means are
  * exact-integer counts over double sums whose groupBy order cannot
  * affect the argmin (PqSpec pins two independent runs identical).
  */
object Pq {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.ofColumns(a, b)

  /** d/m as an INT column that RAISES per row when size(v) % m ≠ 0 — a
    * non-divisible dim would otherwise floor the subvector length and
    * silently drop the trailing d mod m dimensions from every code,
    * rnorm, and LUT. The scaladoc contract is "mixed/mismatched dims
    * fail loudly", so the slice refuses rather than mis-slicing.
    */
  private[ann] def subDimChecked(v: Column, m: Int): Column =
    // the null-vector branch must come FIRST: size(null) is null, so
    // without it a null vector (e.g. MatVecProduct's null row for a
    // mismatched-dim input) falls to the otherwise-branch and raises
    // with a garbled "vector dim NULL" concat — fail with the real cause
    when(v.isNull, raise_error(lit(
      "PQ: null vector — null/mixed-dim embeddings must fail loudly " +
        "rather than be silently dropped from the codes")).cast("int"))
      .when(pmod(size(v), lit(m)) === 0, (size(v) / m).cast("int"))
      .otherwise(raise_error(concat(
        lit("PQ: vector dim "), size(v).cast("string"),
        lit(s" is not divisible by m=$m — trailing dimensions would be " +
          "silently dropped from the codes"))).cast("int"))

  /** The exploded (pq_id, sub, sv) relation: one row per (vector,
    * subspace), subvector length d/m. The subvector length is evaluated
    * per row via [[subDimChecked]], so mixed-dim corpora AND dims not
    * divisible by m fail loudly in the slice rather than silently
    * mis-slicing or truncating.
    */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = {
    val v = asDouble(col(vecCol))
    val sub = subDimChecked(v, m)
    df.select(col(idCol).as("pq_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(v, s * sub + 1, sub))))
      .withColumnRenamed("pos", "sub")
      .withColumnRenamed("col", "sv")
  }

  /** Argmin-code expression for one subvector against one subspace's
    * centroid list: fold over codes minimizing ||c||² − 2·sv·c (the
    * ||sv||² term is constant across codes). `cs` and `cn2` are the
    * subspace's centroids and their squared norms, shipped as literals.
    */
  private def argminCode(sv: Column, cs: Seq[Seq[Double]],
      cn2: Seq[Double]): Column = {
    val clit = typedlit(cs)
    val nlit = typedlit(cn2)
    aggregate(
      sequence(lit(0), lit(cs.size - 1)),
      struct(lit(-1).as("c"), lit(Double.MaxValue).as("best")),
      (acc, c) => {
        val d = element_at(nlit, c + 1) - lit(2.0) * dot(sv, element_at(clit, c + 1))
        when(d < acc.getField("best"), struct(c.as("c"), d.as("best")))
          .otherwise(acc)
      }).getField("c")
  }

  /** Train the codebooks: (subspace INT, code INT, centroid
    * ARRAY<DOUBLE>) — m×k rows, the persistable metadata-sized artifact.
    * One fused job per Lloyd iteration trains every subspace at once.
    *
    * TRAINING SAMPLE (r16, the [[graft.ann.Ann.ivfCentroids]] recipe
    * verbatim): full-corpus Lloyd costs `iterations` passes of N·m·k
    * centroid dots — linear in N but a heavy constant, and multiplied
    * by OPQ_NP's alternations. Codebook QUALITY needs
    * O(k · trainPerCode) evidence per subspace, not the whole corpus
    * (FAISS publishes 39–256 training points per centroid), so Lloyd
    * trains on a deterministic content-hash sample of every d-th vector
    * (d = ⌊N / (k·trainPerCode)⌋, xxhash64 on the id — seedless,
    * reproducible, engine-side only: codebooks are no one's oracle).
    * Corpora under 2 × k·trainPerCode train UNSAMPLED (d = 1) — every
    * oracled SF (≤ 2¹¹ vectors at k = 32) and every pinned fixture sits
    * under the floor, so their codebooks are bit-unchanged. Encoding
    * ([[encode]]) always touches all N rows.
    */
  def fitCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, iterations: Int = 3,
      trainPerCode: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = math.max(1L, corpus.count() / (k.toLong * trainPerCode))
    val trainSrc = if (d <= 1L) corpus
      else corpus.filter(pmod(xxhash64(col(idCol)), lit(d)) === 0)
    val sv = graft.ops.Barrier.iter(subvectors(trainSrc, idCol, vecCol, m))
    try {
      // init: the k corpus vectors with the smallest xxhash64(id); code j
      // = j-th smallest hash, identically in every subspace
      val w = Window.partitionBy(col("sub"))
        .orderBy(xxhash64(col("pq_id")), col("pq_id"))
      var books: IndexedSeq[IndexedSeq[Seq[Double]]] = {
        val init = sv.withColumn("code", row_number().over(w) - 1)
          .filter(col("code") < k)
          .select(col("sub"), col("code"), col("sv")).collect()
        val bySub = init.groupBy(_.getInt(0))
        (0 until m).map(s => bySub(s).sortBy(_.getInt(1))
          .map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq)
      }
      val subDim = books.head.head.size
      for (_ <- 1 to iterations) {
        val assigned = sv.withColumn("code", assignAll(books))
        val sumCols = (0 until subDim).map(j =>
          sum(element_at(col("sv"), j + 1)).as(s"s$j"))
        val rows = assigned.groupBy(col("sub"), col("code"))
          .agg(count(lit(1)).as("n"), sumCols: _*)
          .collect()
        val byCell = rows.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
        books = books.zipWithIndex.map { case (cb, s) =>
          cb.zipWithIndex.map { case (old, c) =>
            byCell.get((s, c)) match {
              case None => old // empty cell keeps its centroid
              case Some(r) =>
                val n = r.getLong(2).toDouble
                (0 until subDim).map(j => r.getDouble(3 + j) / n)
            }
          }
        }
      }
      books.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (c, j) => (s, j, c) }
      }.toDF("subspace", "code", "centroid")
    } finally graft.ops.Barrier.releaseIter(sv)
  }

  /** Per-(sub) assignment over the exploded frame: dispatch on the `sub`
    * column to that subspace's argmin fold. m is small (8–16), so the
    * when-chain stays codegen-friendly.
    */
  private def assignAll(books: IndexedSeq[IndexedSeq[Seq[Double]]]): Column = {
    val norms = books.map(_.map(c => c.map(x => x * x).sum))
    books.indices.foldLeft(lit(-1)) { (acc, s) =>
      when(col("sub") === s,
        argminCode(col("sv"), books(s), norms(s))).otherwise(acc)
    }
  }

  /** Load a codebook table into driver matrices: books(s)(c) = centroid.
    * The code-gap require makes a malformed artifact (partial write,
    * filtered read) fail loudly instead of positionally mis-indexing —
    * shared by every PQ consumer ([[IvfPq]] included).
    */
  private[ann] def collectBooks(codebooks: DataFrame)
      : IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val rows = codebooks.select(col("subspace"), col("code"), col("centroid"))
      .collect()
    // encode reads books.head.size for k; an empty codebook artifact
    // must name itself here, not throw a raw NoSuchElementException
    require(rows.nonEmpty,
      "PQ: empty codebook table — the codebook artifact has no rows " +
        "(was the training stage skipped or its output path wrong?)")
    val bySub = rows.groupBy(_.getInt(0))
    (0 until bySub.size).map(s => {
      val cb = bySub(s).sortBy(_.getInt(1))
      cb.indices.foreach(c => require(cb(c).getInt(1) == c,
        s"codebook subspace $s has a code gap at $c"))
      cb.map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
    })
  }

  /** Encode the corpus: (id, codes ARRAY<INT>, rnorm DOUBLE) — the
    * persistable code table. rnorm = ‖reconstruction‖ assuming
    * subspace-orthogonal decomposition (exact: subvectors are disjoint
    * coordinate blocks). One narrow pass, no shuffle: each subspace's
    * slice is let-bound via a single-element transform() so the fold
    * over codes binds `sv` once instead of re-slicing per code
    * (the HOF-inlining hazard [[Quantize.int8]] documents).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame): DataFrame = {
    val books = collectBooks(codebooks)
    val k = books.head.size
    val norms = books.map(_.map(c => c.map(x => x * x).sum))
    // the rnorm fold is the AdcLookupSum shape with the flattened
    // per-code squared norms as the lut — same index-order sum, native
    encodeCodesWith(corpus, idCol, vecCol, books)
      .withColumn("rnorm", sqrt(graft.functions.AdcLookupSum.ofColumns(
        col("codes"), typedlit(norms.flatten), k)))
  }

  /** Code assignment only — (id, codes ARRAY<INT>) without the rnorm
    * fold, for consumers that reconstruct their own norm (residual PQ
    * stores ‖μ + r̂‖, not ‖r̂‖; paying a per-row m-lookup fold for a
    * column nobody reads is wasted corpus-pass work).
    */
  def encodeCodes(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame): DataFrame =
    encodeCodesWith(corpus, idCol, vecCol, collectBooks(codebooks))

  /** The codes projection over ALREADY-collected books — callers that
    * hold the driver matrices (encode, IvfPq) must not pay a second
    * collect of the codebook artifact.
    */
  private[ann] def encodeCodesWith(corpus: DataFrame, idCol: String,
      vecCol: String, books: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame = {
    // native argmin over all m subspaces in one codegen loop — the r16
    // composed form (m slice + transform-let + aggregate-over-codes HOF
    // islands) paid an interpreted lambda dispatch per (row, subspace,
    // code) across the WHOLE encode pass; arithmetic and tie-breaks are
    // bit-identical (PqAssignCodes scaladoc; fixture oracles pin it)
    // FanOut: the m×k argmin loops per row are the encode pass's whole
    // cost (per-row, partitioning-invariant; the cross-cov consumer
    // accumulates exact integer micro-units, also invariant)
    graft.ops.FanOut(corpus).select(col(idCol),
      graft.functions.PqAssignCodes.ofColumn(asDouble(col(vecCol)), books)
        .as("codes"))
  }

  /** ADC top-`kNeighbors` per query over a PQ code table: per query the
    * driver computes the m×k table of subspace dots lut[s·k+c] =
    * q_s·cb_s_c (m×k doubles — metadata-sized) and ships it as one
    * literal row; scoring a corpus vector is m lookups summed, i.e.
    * dot(q, reconstruction) EXACTLY, so approximation comes only from
    * quantization, never from the distance computation (PqSpec pins ADC
    * ≡ reconstructed-dot). Ranking divides by rnorm·‖q‖ — cosine
    * against the reconstruction.
    */
  def adcTopK(codeTable: DataFrame, codebooks: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      kNeighbors: Int): DataFrame = {
    val spark = codeTable.sparkSession
    val books = collectBooks(codebooks)
    val m = books.size
    val k = books.head.size
    val qRows = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("vq"))
      .collect()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("query_id", queries.schema(idCol).dataType),
      StructField("lut", ArrayType(DoubleType), nullable = false),
      StructField("nq", DoubleType, nullable = false)))
    val lutRows = qRows.map { r =>
      val vq = r.getSeq[Double](1)
      require(vq.size % m == 0,
        s"PQ ADC: query dim ${vq.size} is not divisible by m=$m")
      val subDim = vq.size / m
      val lut = (0 until m).flatMap { s =>
        val qs = vq.slice(s * subDim, (s + 1) * subDim)
        books(s).map(c => c.zip(qs).map { case (a, b) => a * b }.sum)
      }
      Row(r.get(0), lut, math.sqrt(vq.map(x => x * x).sum))
    }
    val luts = spark.createDataFrame(
      spark.sparkContext.parallelize(lutRows.toIndexedSeq, 1), schema)
    val scored = codeTable
      .select(col(idCol).as("neighbor_id"), col("codes"), col("rnorm"))
      .crossJoin(broadcast(luts))
      .filter(col("neighbor_id") =!= col("query_id"))
      // native codegen lookup-sum — one tight loop instead of the
      // aggregate() HOF island whose interpreted dispatch dominated the
      // probe and bloated the stage kernel past HotSpot's huge-method
      // cutoffs (the r16 bimodal-kernel note; semantics and bits
      // identical, AdcLookupSumSpec pins the differential)
      .withColumn("adc_dot",
        graft.functions.AdcLookupSum.ofColumns(col("codes"), col("lut"), k))
      // zero-norm guard: an all-zero query or reconstruction has no
      // direction — define its cosine as 0 rather than NaN (NaN sorts
      // ABOVE every real cosine under a descending window and would
      // fill top-k with garbage; same convention as a zero dot)
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
