package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.text.TextOps

/** Full-text retrieval over the `documents` table: BM25-ranked keyword
  * search — the relevance scorer a corpus-curation pipeline uses to pull
  * topic-targeted training slices ("give me the top documents about X")
  * and the classic inverted-index workload.
  *
  * Shape at 100 TB: the only corpus-wide work is one explode + filter to
  * the query terms (the "inverted index probe" — with a real index this
  * is a term-key lookup; as a scan it is a narrow pass whose output is
  * |matching postings|, not |corpus|), a term-key groupBy for per-doc
  * tf, a terms-sized document-frequency aggregate (broadcast back), and
  * a distributed partial top-k (`orderBy().limit()` →
  * TakeOrderedAndProject — NO global sort, NO single-partition window).
  */
object SearchQ {

  /** The benched query: fixed term set, classic BM25 parameters. */
  val terms: Seq[String] = Seq("spark", "join", "vector", "window")
  val k1 = 1.2
  val b = 0.75

  /** BM25 top-`k` documents for `queryTerms`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Cross-engine exactness: every float input is an integer cast or a
    * shared literal, the expression tree is mirrored verbatim in the
    * oracle SQL, and per-term weights are rounded to 6dp then summed as
    * exact DECIMALs (order-independent; see [[TextQ.lmScore]] for the
    * ln-ulp analysis). Ranking uses the rounded sum with a doc_id
    * tiebreak, so order is deterministic in both engines.
    */
  def bm25(spark: SparkSession, dir: String, queryTerms: Seq[String],
      k: Int): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    // corpus stats: two integers, broadcast to every posting
    val stats = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("tl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("tl").cast("double") / col("n").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        ((col("n") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("w", round(
        col("idf") * (col("tf").cast("double") * lit(k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) *
              (col("dl").cast("double") / col("avgdl")))),
        6).cast(DecimalType(18, 6)))
    val perDoc = scored.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"), sum(col("w")).as("sw"))
      .withColumn("score", col("sw").cast("double"))
      .select("doc_id", "n_terms", "score")
      // distributed partial top-k; the window below ranks only k rows
      .orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "doc_id", "n_terms", "score")
  }

  /** SparkEntry registration: top-10 for the fixed query. */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25(spark, dir, terms, k = 10)

  /** Hybrid retrieval: the BM25 keyword list fused with a dense cosine
    * list via reciprocal-rank fusion (Cormack, Clarke & Buettcher,
    * SIGIR 2009): rrf(d) = Σ_lists 1/(K + rank_list(d)), K = 60 — the
    * standard first-stage retrieval for RAG/training-slice selection
    * (sparse recalls exact terms, dense recalls paraphrases; RRF needs
    * no score calibration because it only consumes RANKS).
    *
    * Scale shape: each retriever produces a k-row list with its own
    * 100 TB-shaped plan (BM25's posting-probe aggregation, ANN's
    * broadcast-query scan — or any indexed variant, since only ranks
    * cross the fusion boundary); the fusion itself is a full-outer join
    * of two k-row frames — driver-trivial at any corpus size.
    *
    * Cross-engine exactness: rrf is a sum of exactly two IEEE double
    * divisions of integers (rank lists are integer-exact in both
    * engines because both upstream queries hash-match), so ordering and
    * values are deterministic; absent ranks surface as -1, not NULL, to
    * keep the compare dtype stable.
    */
  def hybrid(spark: SparkSession, dir: String, queryTerms: Seq[String],
      queryVecId: Long, kEach: Int, k: Int): DataFrame = {
    val sparse = bm25(spark, dir, queryTerms, kEach)
      .select(col("doc_id"), col("rank").as("rank_sparse"))
    val emb = Tables(spark, dir, "embeddings")
    val dense = graft.ann.Ann.bruteForceTopK(
        emb, emb.filter(col("vec_id") === queryVecId),
        "vec_id", "embedding", kEach)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("rank_dense"))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60L) + col("rank_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + col("rank_dense")), lit(0.0)), 6))
      .withColumn("rank_sparse", coalesce(col("rank_sparse"), lit(-1L)))
      .withColumn("rank_dense", coalesce(col("rank_dense"), lit(-1L)))
      // rrf is a 6dp-exact composite of integer ranks: ordering by the
      // rounded value is itself deterministic (no post-round ties beyond
      // genuine rank-pattern ties, broken by doc_id)
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "doc_id", "rank_sparse", "rank_dense", "rrf")
  }

  /** SparkEntry registration: fixed terms + the embedding of vec 0,
    * top-20 per list, fused top-10.
    */
  def hybridSearch(spark: SparkSession, dir: String): DataFrame =
    hybrid(spark, dir, terms, queryVecId = 0L, kEach = 20, k = 10)
}
