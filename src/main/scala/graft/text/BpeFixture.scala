package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinned fixture corpus for the BPE ORACLE: training is an iterative
  * argmax (engine-seeded only in the sense that no SQL engine replays
  * the merge loop), so the corpus-wide q_bpe_train / q_bpe_encode stay
  * rows-only — but ENCODE-UNDER-PINNED-MERGES over a fixed vocabulary
  * is a pure lookup both engines share. The 12 merges the trainer
  * produces on these 10 docs are precomputed once and pinned in
  * [[merges]], the resulting per-word token counts in [[wordToks]]
  * (BpeSpec's drift guards recompute BOTH from [[docs]] every run,
  * against the distributed trainer AND the from-scratch scalar
  * reference), and DuckDB reproduces the per-document stats from the
  * same pinned counts — the SimhashFixture pattern applied to BPE,
  * retiring the last `no_oracle` family without a hash-matched twin.
  *
  * Corpus shape: the classic low/lower/lowest · new/newer/newest ·
  * wide/wider/widest subword families (shared stems and the er/est
  * suffixes make the merge table non-trivial) plus function words, so
  * encodings range from fully-merged single tokens (`low` → 1) to
  * unmerged character runs (`market` → 6).
  */
object BpeFixture {

  /** (doc_id, text) — the pinned corpus (already normalized: lowercase
    * alphanumerics and single spaces, so tokenization is `split`).
    */
  val docs: Seq[(Long, String)] = Seq(
    1L -> "low lower newest lowest",
    2L -> "new newer newest wide",
    3L -> "wider widest low newest",
    4L -> "lowest low low newer",
    5L -> "newest wide wider new",
    6L -> "the lowest bid wins the widest reach",
    7L -> "a new low for the wider market",
    8L -> "newer wider lower",
    9L -> "bid low bid wide",
    10L -> "wins the newest bid")

  /** The engine's merge table for [[docs]] at 12 merges — precomputed
    * by [[Bpe.train]] and PINNED (rank, left, right, weighted count).
    * BpeSpec fails if the trainer ever drifts from these, which would
    * silently break the oracle below.
    */
  val merges: Seq[(Long, String, String, Long)] = Seq(
    (1L, "i", "d", 13L),
    (2L, "w", "e", 13L),
    (3L, "l", "o", 11L),
    (4L, "n", "e", 11L),
    (5L, "t", Bpe.Eow, 11L),
    (6L, "r", Bpe.Eow, 10L),
    (7L, "s", "t" + Bpe.Eow, 10L),
    (8L, "id", "e", 9L),
    (9L, "w", Bpe.Eow, 9L),
    (10L, "w", "ide", 9L),
    (11L, "ne", "we", 8L),
    (12L, "lo", "w" + Bpe.Eow, 6L))

  /** The merge pairs in rank order — what [[Bpe.encodeWords]] applies. */
  def mergePairs: Seq[(String, String)] =
    merges.map { case (_, l, r, _) => (l, r) }

  /** Every distinct fixture word with its token count under [[merges]]
    * — precomputed by [[Bpe.encodeWords]] and PINNED (drift-guarded by
    * BpeSpec's scalar fold); the DuckDB oracle joins words to THESE.
    */
  val wordToks: Seq[(String, Long)] = Seq(
    "a" -> 2L, "bid" -> 3L, "for" -> 3L, "low" -> 1L, "lower" -> 3L,
    "lowest" -> 3L, "market" -> 6L, "new" -> 2L, "newer" -> 2L,
    "newest" -> 2L, "reach" -> 6L, "the" -> 4L, "wide" -> 2L,
    "wider" -> 2L, "widest" -> 2L, "wins" -> 5L)

  /** `(doc_id, text)` VALUES rows for the DuckDB oracle. */
  def docsValuesSql: String =
    docs.map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }
      .mkString(",\n  ")

  /** `(word, n_toks)` VALUES rows for the DuckDB oracle. */
  def wordValuesSql: String =
    wordToks.map { case (w, n) => s"('$w', CAST($n AS BIGINT))" }
      .mkString(",\n  ")

  /** The fixture corpus as a DataFrame. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }
}
