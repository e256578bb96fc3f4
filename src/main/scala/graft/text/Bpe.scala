package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and encoding (Sennrich,
  * Haddow & Birch, ACL 2016) — the tokenizer-construction workload of
  * an LLM data pipeline, Spark-shaped:
  *
  *  - Training runs on the DISTINCT-WORD frequency table, not the raw
  *    corpus: merges never cross word boundaries, so the corpus-sized
  *    work is exactly ONE scan (explode + groupBy to word counts);
  *    every merge iteration is an aggregation over |vocab| rows — at
  *    100 TB that's ~10⁸ distinct words, comfortably distributed,
  *    while the corpus is never rescanned.
  *  - Each iteration counts weighted adjacent symbol pairs
  *    (map-side-combinable sum), collects ONE row (the argmax pair —
  *    count desc, then lexicographic, so training is deterministic),
  *    and applies the merge as a narrow per-row fold. The symbol table
  *    is barriered per iteration ([[graft.ops.Barrier.iter]] — lineage
  *    truncation in every mode, reliable files on a cluster): k
  *    collects must not replay k lineages (the same fused-iteration
  *    reasoning as [[graft.ann.Ann]]'s Lloyd loop).
  *  - Encoding joins each document's words to the once-encoded
  *    distinct-word table — corpus tokens never pass through the
  *    merge loop.
  */
object Bpe {

  /** End-of-word marker: makes suffix symbols distinct from mid-word
    * symbols, per the original BPE formulation.
    */
  val Eow = "</w>"

  /** Greedy left-to-right single-merge application: adjacent
    * (left, right) symbol pairs collapse to their concatenation,
    * non-overlapping ("aaa" + (a,a) → ["aa", "a"]).
    */
  private[text] def mergeOnce(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(left) && (x === lit(right)),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** (word, n) distinct-word frequency table — the one corpus-sized
    * scan in training.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Adjacent symbol pairs as (l, r) structs. */
  private def adjacentPairs(syms: Column): Column = {
    val n = size(syms)
    zip_with(
      slice(syms, lit(1), greatest(n - 1, lit(0))),
      slice(syms, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** Train `merges` BPE merges over the word-frequency table. Returns
    * the merge table (rank, left, right, n) — the vocabulary artifact a
    * tokenizer ships. Stops early if no adjacent pair remains.
    */
  def train(words: DataFrame, merges: Int): DataFrame = {
    val spark = words.sparkSession
    var syms = graft.ops.Barrier.iter(
      words.select(col("word"), col("n"),
        concat(split(col("word"), ""), array(lit(Eow))).as("syms")))
    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to merges if !exhausted) {
      val top = syms
        .select(col("n"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += ((rank.toLong, l, r, c))
        val next = graft.ops.Barrier.iter(
          syms.withColumn("syms", mergeOnce(col("syms"), l, r)))
        graft.ops.Barrier.releaseIter(syms)
        syms = next
      }
    }
    graft.ops.Barrier.releaseIter(syms)
    import spark.implicits._
    out.toSeq.toDF("rank", "left", "right", "n")
  }

  /** Encode the distinct-word table with a driver-side merge list
    * (rank order): (word, toks ARRAY<STRING>). The merge loop runs
    * over |vocab| rows; corpus-sized encoding is a join against this.
    */
  def encodeWords(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.select(col("word"),
        concat(split(col("word"), ""), array(lit(Eow))).as("toks"))) {
      case (df, (l, r)) => df.withColumn("toks", mergeOnce(col("toks"), l, r))
    }

  /** Per-document BPE token counts: words join the once-encoded vocab
    * table; output is (doc_id, n_words, n_bpe_tokens).
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
    val encoded = encodeWords(words.select(col("word")).distinct(), merges)
      .select(col("word"), size(col("toks")).cast("long").as("n_toks"))
    words.join(encoded, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_toks")).cast("long").as("n_bpe_tokens"))
  }
}
