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

  /** Train `merges` BPE merges in BATCHES — one distributed pair-count
    * pass per batch of merges instead of per merge, PROVABLY identical
    * to [[train]]'s sequential argmax (BpeSpec pins table-for-table
    * parity at 200+ merges). At real tokenizer scale (30k+ merges)
    * the sequential trainer is 30k Spark jobs; this runs
    * merges/batch-size of them.
    *
    * Exactness argument (why a batch can be applied without recounting
    * between its members): sort all pairs by (count desc, left, right)
    * — sequential's exact pick order. Take the maximal PREFIX that is
    * pairwise symbol-disjoint, stopping at the first interference (no
    * skipping), then truncate to the largest j with count(p_j) STRICTLY
    * above the first non-taken pair's count B. Then for each i ≤ j, at
    * sequential step i:
    *   - p_i's own adjacency count is UNCHANGED by merging p_1..p_{i-1}
    *     (replacing occurrences of a disjoint pair never creates or
    *     destroys an adjacency of p_i's symbols);
    *   - every pair outside the prefix still counts ≤ B < count(p_i)
    *     (original counts only decrease under merging);
    *   - every NEW pair (x, a·b) created by a merge (a, b) counts at
    *     most the pre-merge count of (x, a) — each "x·ab" occurrence
    *     was an "x a b" occurrence — and (x, a) interferes with (a, b)
    *     so it sits outside the prefix: inductively every new pair
    *     counts ≤ B < count(p_i);
    *   - ties INSIDE the prefix resolve by the same (l, r) order the
    *     sort already applied.
    *   So sequential's argmax at step i is exactly p_i. A batch of one
    *   (the plain argmax) is always safe, so progress never stalls.
    *
    * Three created-symbol clauses make the count-invariance claims
    * above airtight: (1) a prefix pair naming a symbol an EARLIER
    * accepted merge creates (e.g. (c, "ab") after (a, b)) is treated as
    * an interferer — its count grows mid-batch; (2) a prefix pair whose
    * OWN concatenation equals a symbol an earlier accepted merge
    * creates (e.g. ("a","bc") then ("ab","c"), both making "abc") stops
    * the prefix there — two same-name creations conflate, so a new pair
    * (x, "abc") could accumulate c₁+c₂ ≤ 2B > B occurrences and beat a
    * later prefix member at its sequential turn; (3) a created symbol
    * colliding with a PRE-EXISTING vocabulary symbol (e.g. merging
    * ("in","g") while "ing" already exists) stops the prefix there,
    * because conflated occurrences could grow an outside pair past B.
    * (3) is checked with one narrow symbol-existence probe per round.
    *
    * `maxBatch` additionally caps a batch (plan health: each member is
    * one nested fold in the single apply pass); any prefix cut keeps
    * the strict-gap rule against the first non-taken pair, so the
    * proof is unaffected.
    */
  def trainBatched(words: DataFrame, merges: Int,
      maxBatch: Int = 48): DataFrame =
    trainBatchedStats(words, merges, maxBatch)._1

  /** [[trainBatched]] plus the per-round accepted-batch sizes — the
    * merges-per-pass evidence the scale claim rests on (a 30k-merge
    * tokenizer build collapses to hundreds of distributed passes ONLY
    * if the accepted prefix stays near maxBatch; graft.BenchBpe
    * measures the distribution at ≥1,000 merges).
    */
  def trainBatchedStats(words: DataFrame, merges: Int,
      maxBatch: Int = 48): (DataFrame, Seq[Int]) = {
    val spark = words.sparkSession
    var syms = graft.ops.Barrier.iter(
      words.select(col("word"), col("n"),
        concat(split(col("word"), ""), array(lit(Eow))).as("syms")))
    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val batchSizes = mutable.ArrayBuffer.empty[Int]
    var exhausted = false
    while (out.size < merges && !exhausted) {
      val want = math.min(maxBatch, merges - out.size)
      // want+1 rows: the boundary count B must be visible even when
      // the whole fetch is disjoint
      val top = syms
        .select(col("n"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r")).limit(want + 1)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // maximal disjoint prefix, stopped at the FIRST interference —
        // a pair interferes if it shares a symbol with an accepted
        // pair, OR names a symbol an accepted pair's merge CREATES, OR
        // its own concatenation collides with a symbol an accepted
        // merge creates (two same-name creations conflate downstream
        // new-pair counts up to 2B; see the created-symbol clauses in
        // the scaladoc)
        val used = mutable.Set.empty[String]
        val created = mutable.Set.empty[String]
        var k = 0
        while (k < math.min(want, top.length) &&
            !used(top(k)._1) && !used(top(k)._2) &&
            !created(top(k)._1) && !created(top(k)._2) &&
            !created(top(k)._1 + top(k)._2)) {
          used += top(k)._1 += top(k)._2
          created += top(k)._1 + top(k)._2
          k += 1
        }
        // a created symbol COLLIDING with a pre-existing vocabulary
        // symbol would grow outside-prefix counts (new occurrences
        // conflate with the old symbol's), voiding the ≤ B bound —
        // stop the prefix at the first such pair (one tiny existence
        // probe per ROUND; the colliding pair alone is still safe, so
        // progress never stalls)
        if (k > 1) {
          val concats = top.take(k).map(t => t._1 + t._2).distinct
          val existing = syms.select(explode(col("syms")).as("s"))
            .filter(col("s").isin(concats: _*))
            .distinct().collect().map(_.getString(0)).toSet
          top.take(k).indexWhere(t => existing(t._1 + t._2)) match {
            case -1 =>
            case 0 => k = 1
            case i => k = i
          }
        }
        // strict-gap truncation: count(p_j) must exceed the first
        // non-taken pair's count (index j in the sorted order); batch
        // of 1 is exempt (the plain argmax with deterministic ties)
        var j = k
        while (j > 1 && j < top.length && top(j - 1)._3 <= top(j)._3)
          j -= 1
        val batch = top.take(math.max(1, j))
        batchSizes += batch.length
        batch.zipWithIndex.foreach { case ((l, r, c), i) =>
          out += ((out.size + 1L, l, r, c))
        }
        // ONE distributed pass applies the whole batch in rank order
        val merged = batch.foldLeft(col("syms")) { case (acc, (l, r, _)) =>
          mergeOnce(acc, l, r)
        }
        val next = graft.ops.Barrier.iter(syms.withColumn("syms", merged))
        graft.ops.Barrier.releaseIter(syms)
        syms = next
      }
    }
    graft.ops.Barrier.releaseIter(syms)
    import spark.implicits._
    (out.toSeq.toDF("rank", "left", "right", "n"), batchSizes.toSeq)
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
