package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance reranking (Carbonell & Goldstein, SIGIR
  * 1998): greedily re-order a candidate list to balance relevance to
  * the query against redundancy with what's already selected —
  * mmr(d) = λ·sim(d, q) − (1−λ)·max_{s∈S} sim(d, s).
  * The context-diversification step between retrieval and consumption
  * (RAG context assembly, training-slice picking): near-duplicate
  * candidates waste the budget, MMR spends it on coverage.
  *
  * Scale shape: candidate GENERATION is the corpus-sized work and stays
  * distributed (any retriever — brute, IVF, PQ — produces the k-row
  * list); the rerank itself is query-time serving logic over k
  * candidates (k² pairwise sims of k vectors — metadata-sized, like the
  * IVF probe's route table), so it runs on the driver by design. The
  * greedy loop is data-dependent, so there is no static SQL oracle;
  * MmrSpec pins it against a from-scratch scalar implementation, the
  * λ=1 degeneration to pure relevance order, and determinism.
  */
object Mmr {

  /** Rerank the top-`k` of `candidates`. The candidate frame has a FIXED
    * contract — columns `doc_id` (LONG) and `cosine` (DOUBLE), i.e. the
    * shape every retriever in this engine emits (Ann.topK / Pq.adcTopK /
    * IvfPq) — while `idCol`/`vecCol` name the id/vector columns of `emb`,
    * whose schema varies by corpus. Vectors for the pairwise term come
    * from `emb`; ties break by smaller doc_id at every argmax so the
    * selection is deterministic.
    *
    * @return (rank, doc_id, relevance, mmr_score) — mmr_score is the
    *         objective value at selection time (rank 1 has no
    *         redundancy term yet: score = λ·relevance)
    */
  def rerank(spark: SparkSession, candidates: DataFrame, emb: DataFrame,
      idCol: String, vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    require(candidates.columns.contains("doc_id") &&
      candidates.columns.contains("cosine"),
      "Mmr.rerank candidates must carry (doc_id LONG, cosine DOUBLE) — " +
        s"got [${candidates.columns.mkString(", ")}]; idCol/vecCol name " +
        "the EMBEDDING frame's columns, not the candidate frame's")
    import org.apache.spark.sql.types.LongType
    require(candidates.schema("doc_id").dataType == LongType,
      "Mmr.rerank candidate doc_id must be LONG, got " +
        candidates.schema("doc_id").dataType.simpleString)
    val cands = candidates.select(col("doc_id"), col("cosine"))
      .collect().map { r =>
        // zero-norm guard, same convention as Pq.adcTopK: a NaN
        // relevance (0/0 cosine from a zero vector) scores as 0 instead
        // of crashing the BigDecimal rounding below
        val rel = r.getDouble(1)
        r.getLong(0) -> (if (rel.isNaN) 0.0 else rel)
      }
      .sortBy { case (id, rel) => (-rel, id) }
    val ids = cands.map(_._1)
    val vecs = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(col(idCol).isin(ids: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val orphans = ids.filterNot(vecs.contains)
    require(orphans.isEmpty,
      s"Mmr.rerank: ${orphans.length} candidate id(s) have no vector in " +
        s"emb.$idCol (first few: ${orphans.take(5).mkString(", ")}) — " +
        "the candidate list and embedding corpus are out of sync")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val relOf = cands.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashSet(ids: _*)
    while (selected.size < math.min(k, ids.length)) {
      val best = remaining.toSeq.map { id =>
        val redundancy =
          if (selected.isEmpty) 0.0
          else selected.map { case (s, _) => cos(vecs(id), vecs(s)) }.max
        (id, lambda * relOf(id) - (1.0 - lambda) * redundancy)
      }.minBy { case (id, score) => (-score, id) }
      selected += best
      remaining -= best._1
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex.map { case ((id, score), i) =>
      (i + 1L, id, relOf(id),
        BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toDF("rank", "doc_id", "relevance", "mmr_score")
  }
}
