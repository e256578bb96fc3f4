package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column operators for large-scale document pipelines:
  * normalization, tokenization, token statistics, stopword/quality
  * signals, n-gram-heuristic language ID and rolling-hash fingerprints.
  *
  * These extend the reference's validation layer (SURVEY.md §2.7 — the
  * reference validates transaction payloads; a training-data pipeline
  * validates documents) with the per-document scoring a 100 TB corpus
  * needs before dedup/filtering.
  *
  * Everything here is a pure `Column` expression — narrow (no shuffle),
  * codegen-friendly except the higher-order `aggregate` folds, which
  * Spark evaluates per-element but still fully distributed and
  * pipelined inside the scan stage. All arithmetic is integer or
  * exact-double so the DuckDB oracle reproduces results bit-for-bit.
  */
object TextOps {

  /** Lowercased, non-alphanumerics collapsed to single spaces, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** "BPE-ish" regex token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token — the usual cheap
    * stand-in for a subword tokenizer's token count.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Sum of the elements' lengths (total characters across tokens). */
  def totalTokenChars(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Fraction of tokens found in `words`, as an exact double in [0,1]. */
  def wordRatio(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, t => array_contains(lit(words.toArray), t)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** English-ish stopwords used for the quality signal. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Rolling polynomial hash (base 31, mod 1e9+7) over the characters of
    * `s` — the classic Rabin–Karp document fingerprint, order-sensitive.
    * Fold is left-to-right so every engine computes the identical value.
    * Backed by the native codegen'd [[graft.functions.RollingHash]]
    * expression; [[rollingHashFold]] is the pure-built-ins reference
    * implementation it is differentially tested against.
    */
  def rollingHash(s: Column): Column =
    graft.functions.RollingHash.ofColumn(s)

  /** Reference implementation of [[rollingHash]] using only public
    * higher-order functions (interpreted, allocates a per-char array).
    */
  def rollingHashFold(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % 1000000007L)

  /** Distinct word n-gram shingles of a token array (space-joined). A doc
    * with fewer than `n` tokens has no shingles. The shingle SET (not
    * multiset) is the standard unit for Jaccard/MinHash dedup.
    *
    * Built by zipping the token array with its own offsets — n−1 linear
    * passes. The obvious per-position `slice(toks, i, n)` is O(|d|²) per
    * document and measured ~3× slower over the corpus. Trailing partial
    * shingles surface as nulls (zip_with pads, concat propagates) and
    * are dropped by array_compact, which also yields the correct empty
    * result for docs shorter than `n` tokens.
    */
  def shingles(toks: Column, n: Int): Column = {
    val joined = (1 until n).foldLeft(toks) { (acc, i) =>
      zip_with(acc,
        slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(array_compact(joined))
  }

  /** Ordered, NON-distinct word bigrams of a token array, space-joined —
    * the n-gram language-model unit. Unlike [[shingles]] (a distinct SET
    * for dedup identity), an LM counts the bigram MULTISET in document
    * order. Built by zipping the array against its own 1-shifted slice
    * (one linear pass, no per-position slicing); a doc with fewer than 2
    * tokens has no bigrams.
    */
  def bigrams(toks: Column): Column = {
    val n = org.apache.spark.sql.functions.size(toks)
    zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Unordered co-occurring token pairs within a `win`-token sliding
    * window: for each position i and gap j ∈ [1, win], the pair
    * (toks[i], toks[i+j]) with the two tokens alphabetically ordered
    * (the symmetric-window convention PMI/word2vec statistics use).
    * One zip against a j-shifted slice per gap — `win` linear passes,
    * multiset semantics (every co-occurrence counts once).
    */
  def cooccurrences(toks: Column, win: Int): Column = {
    val n = org.apache.spark.sql.functions.size(toks)
    flatten(transform(sequence(lit(1), lit(win)), j =>
      zip_with(
        slice(toks, lit(1), greatest(n - j, lit(0))),
        slice(toks, j + 1, greatest(n - j, lit(0))),
        (a, b) => concat(least(a, b), lit(" "), greatest(a, b)))))
  }

  /** Overlapping token-window chunks: windows of `size` tokens starting
    * every `stride` tokens, 1 + ⌈max(n−size, 0)/stride⌉ chunks — every
    * token covered and NO chunk fully contained in its predecessor (a
    * naive (n−1) div stride bound re-emits a strict suffix of the
    * previous chunk for ~(size−stride)/stride of documents: duplicated
    * training samples). The standard long-document → training-sample
    * split; emitted as (chunk_idx, chunk_text) structs for a downstream
    * explode.
    */
  def chunks(toks: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size)
    val n = org.apache.spark.sql.functions.size(toks)
    // ceil(max(n-size,0)/stride) in exact integer arithmetic
    val lastIdx = floor((greatest(n - size, lit(0)) + (stride - 1)) / lit(stride))
      .cast("int")
    transform(
      sequence(lit(0), lastIdx),
      i => struct(
        i.cast("long").as("chunk_idx"),
        array_join(slice(toks, i * stride + 1, lit(size)), " ").as("chunk")))
  }

  /** Order-independent content fingerprint: rolling hash of the sorted
    * distinct token list (bag-of-words identity; catches reorderings that
    * the order-sensitive fingerprint misses).
    */
  def bagHash(toks: Column): Column =
    rollingHash(array_join(array_sort(array_distinct(toks)), " "))

  /** PII patterns for corpus scrubbing — deliberately restricted to
    * regex constructs Java (Spark) and RE2 (DuckDB/Go scanners) compile
    * IDENTICALLY (character classes, bounded repeats; no backrefs or
    * lookaround), so the redaction is reproducible across engines. Order
    * matters: emails first (their local part may contain digits), then
    * IPs (dots would otherwise be split by the phone pattern), then
    * phones.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<email>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<ip>"),
    ("phone", "\\+?[0-9][0-9 ()-]{6,}[0-9]", "<phone>"))

  /** Redact one PII category, returning (count, redacted). */
  def redact(text: Column, pattern: String, token: String): (Column, Column) =
    (size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long"),
      regexp_replace(text, pattern, token))

  /** Marker tokens per language for the n-gram-heuristic language ID.
    * Priority order (ties resolve to the earlier entry) is part of the
    * operator contract.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour"),
    "zh" -> Seq("de", "shi", "bu", "zhe", "ge"))

  /** Per-language marker-hit ratios, in declaration order. */
  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, markers) => lang -> wordRatio(toks, markers) }

  /** Predicted language: argmax of the marker ratios with first-wins
    * tie-break in `langMarkers` order. The sequential chain
    * `when(s_i >= max(s_{i+1}…s_n))` is a correct first-wins argmax: if
    * entry i fails its test, some later score strictly exceeds it.
    */
  def predictLang(scores: Seq[(String, Column)]): Column = {
    def gmax(cs: Seq[Column]): Column =
      if (cs.size == 1) cs.head else greatest(cs: _*)
    scores.zipWithIndex.init.foldRight(lit(scores.last._1): Column) {
      case (((lang, s), i), rest) =>
        when(s >= gmax(scores.drop(i + 1).map(_._2)), lang).otherwise(rest)
    }
  }
}
