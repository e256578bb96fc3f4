package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinned fixture for the MMR greedy-rerank ORACLE — [[PqFixture]]'s
  * pattern applied to the selection loop.
  *
  * The corpus-scale q_ann_mmr stays rows-only: its candidate list and
  * relevances come from a float cosine scan. But the GREEDY LOOP itself
  * — score = λ·rel − (1−λ)·max_{s∈S} cos(d, s), argmax with smaller-id
  * tiebreak, k steps — is exact arithmetic when relevances and vectors
  * are pinned small integers: integer dots are exact in DOUBLE,
  * sqrt/division are correctly-rounded IEEE ops identical across
  * engines, and λ = 0.25 / (1−λ) = 0.75 are both exactly representable
  * doubles (a λ like 0.7 is NOT: 1.0−0.7 ≠ the literal 0.3 in binary,
  * and the two engines would diverge). DuckDB replays the k selection
  * steps as unrolled CTEs (the graph-oracle pattern), so the comparison
  * is a HASH match over the full (rank, doc_id, relevance, mmr_score)
  * trace.
  *
  * Candidates are the first 12 ids of [[PqFixture.corpus]], whose
  * pattern repeats every 9 ids — ids (0,9), (1,10), (2,11) are EXACT
  * duplicate vectors. Relevances are tied in bands (9 − id mod 3), so
  * the redundancy term actually decides the order: the greedy selection
  * [0, 7, 6, 3, 9, 1] visibly differs from the pure-relevance order
  * [0, 3, 6, 9, 1, 4].
  */
object MmrFixture {

  val k = 6
  val lambda = 0.25
  val nCandidates = 12

  /** (doc_id, relevance) — tied bands so redundancy breaks order. */
  val candidates: Seq[(Long, Int)] =
    (0L until nCandidates.toLong).map(id => id -> (9 - (id % 3)).toInt)

  /** The candidate frame in the retriever contract shape
    * ([[Mmr.rerank]]: doc_id LONG, cosine DOUBLE).
    */
  def candidatesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    candidates.map { case (id, r) => (id, r.toDouble) }
      .toDF("doc_id", "cosine")
  }

  def candidatesValuesSql: String =
    candidates.map { case (id, r) => s"(CAST($id AS BIGINT), $r)" }
      .mkString(",\n  ")
}
