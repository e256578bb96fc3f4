package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.Barrier.Ops
import graft.text.TextOps

/** Text-analysis queries over the `documents` table. Each is a single
  * narrow scan-stage pass (no shuffle) — per-document scoring stays
  * embarrassingly parallel at any corpus size; only the final driver
  * collect in Verify is small. DuckDB oracle twins live in
  * `SparkEntry.oracleSql`.
  */
object TextQ {

  /** Token statistics per document: whitespace tokens, BPE-ish regex
    * tokens, distinct tokens, average token length.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    // tokenize ONCE at a Generate barrier (the chunkDocs discipline),
    // then the char-sum fold runs as the native single-pass TokenStats
    // loop instead of an interpreted per-token aggregate (r16; values
    // bit-identical — TokenStatsSpec pins the fold differential)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(array(struct(TextOps.tokens(col("text")).as("toks")))).as("s"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        size(col("s.toks")).cast("long").as("ws_tokens"),
        TextOps.regexTokenCount(col("text")).cast("long").as("re_tokens"),
        size(array_distinct(col("s.toks"))).cast("long").as("distinct_tokens"),
        round(element_at(graft.functions.TokenStats.ofColumn(
          col("s.toks"), Nil), 1).cast("double") /
          size(col("s.toks")).cast("double"), 6).as("avg_token_len"))
  }

  /** Quality scoring: stopword ratio, lexical diversity, length signal,
    * composite score and keep/drop verdict — the pre-training corpus
    * filter. All ratios are exact integer/integer doubles rounded to 6dp
    * so both engines agree bitwise.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    // FanOut (r18): the tokenize + stats map is the whole cost and a
    // compact corpus arrives as one parquet split — same scan-
    // parallelism floor as [[graft.dedup.Dedup]]'s shingle pass.
    // Tokenize ONCE at a Generate barrier, then ONE native TokenStats
    // pass feeds the stopword count (previously an interpreted
    // filter-HOF island per document on top of a re-inlined tokenize
    // chain per statistic; ratios divide the same exact integers —
    // TokenStatsSpec pins the differential)
    graft.ops.FanOut(Tables(spark, dir, "documents"))
      .select(col("doc_id"), explode(array(struct(
        TextOps.tokens(col("text")).as("toks")))).as("s"))
      .select(col("doc_id"), col("s.toks").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_ratio",
        round(element_at(graft.functions.TokenStats.ofColumn(
          col("toks"), Seq(TextOps.stopwords)), 2).cast("double") /
          size(col("toks")).cast("double"), 6))
      .withColumn("diversity",
        round(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"), 6))
      .withColumn("length_signal",
        round(least(col("n_tokens").cast("double") / 50.0, lit(1.0)), 6))
      // composite in exact DECIMAL (the 6dp components are exact decimals):
      // double rounding of a x.xxxxxx5 midpoint differs across engines,
      // decimal arithmetic never needs to round
      .withColumn("quality",
        (lit(BigDecimal("0.4")) * col("length_signal").cast(DecimalType(9, 6)) +
          lit(BigDecimal("0.3")) * col("diversity").cast(DecimalType(9, 6)) +
          lit(BigDecimal("0.3")) *
            (lit(BigDecimal("1.0")) - col("stop_ratio").cast(DecimalType(9, 6))))
          .cast("double"))
      .withColumn("keep", col("quality") >= 0.5 && col("n_tokens") >= 10)
      .drop("toks")
  }

  /** n-gram-heuristic language identification: marker-token hit ratios
    * per language, argmax with fixed-priority tie-break.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    // one tokenize + ONE native TokenStats pass over all five marker
    // sets (previously five filter-HOF islands per document); each
    // score divides the same exact hit/size integers as before
    val langs = TextOps.langMarkers.map(_._1)
    val scoreCols = langs.zipWithIndex.map { case (l, i) =>
      round(element_at(col("st"), i + 2).cast("double") /
        size(col("toks")).cast("double"), 6).as(s"score_$l")
    }
    graft.ops.FanOut(Tables(spark, dir, "documents"))
      .select(col("doc_id"), explode(array(struct(
        TextOps.tokens(col("text")).as("toks")))).as("s"))
      .select(col("doc_id"), col("s.toks").as("toks"))
      .select(col("doc_id"), col("toks"), explode(array(struct(
        graft.functions.TokenStats.ofColumn(col("toks"),
          TextOps.langMarkers.map(_._2)).as("st")))).as("s2"))
      .select(col("doc_id"), col("toks"), col("s2.st").as("st"))
      .select(col("doc_id") +: scoreCols: _*)
      .withColumn("predicted",
        TextOps.predictLang(langs.map(l => l -> col(s"score_$l"))))
  }

  /** Long-document chunking: 100-token windows every 80 tokens — the
    * training-sample splitter. Two explodes per doc, no shuffle.
    *
    * The first explode(array(tokens)) is a Generate plan barrier: the
    * regexp+split tokenize chain runs ONCE per document and `chunks`'
    * three references (count, last index, the per-window slice lambda)
    * read the materialized array attribute. Without it CollapseProject
    * inlines the tokenize expression into every reference — the same
    * re-evaluation hazard [[graft.dedup.Dedup.minhashIndex]] documents,
    * measured 3.2× slower here at sf0.1 (r3 bench). PlanSpec pins the
    * single-tokenize shape.
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.FanOut(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(array(TextOps.tokens(col("text")))).as("toks"))
      .select(col("doc_id"),
        explode(TextOps.chunks(col("toks"), size = 100, stride = 80)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk").as("chunk"))
  }

  /** Intra-document repetition scoring (Gopher-style quality rule):
    * duplicate-n-gram fraction for n = 2, 3 — boilerplate and
    * degenerate-generation text scores high and gets dropped before
    * training. Narrow pass, no shuffle.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    def ratio(total: org.apache.spark.sql.Column, dist: org.apache.spark.sql.Column) =
      when(total > 0,
        round(lit(1.0) - dist.cast("double") / total.cast("double"), 6))
        .otherwise(lit(0.0))
    graft.ops.FanOut(Tables(spark, dir, "documents"))
      .select(col("doc_id"),
        greatest(size(toks) - 1, lit(0)).cast("long").as("total_2grams"),
        size(TextOps.shingles(toks, 2)).cast("long").as("distinct_2grams"),
        greatest(size(toks) - 2, lit(0)).cast("long").as("total_3grams"),
        size(TextOps.shingles(toks, 3)).cast("long").as("distinct_3grams"))
      .withColumn("dup_ratio_2", ratio(col("total_2grams"), col("distinct_2grams")))
      .withColumn("dup_ratio_3", ratio(col("total_3grams"), col("distinct_3grams")))
      .withColumn("repetitive", col("dup_ratio_2") > 0.2)
  }

  /** Training-sequence packing over the corpus: 512-token sequences on
    * the deterministic concatenated tape (see [[graft.text.Packing]]).
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    graft.text.Packing.packSequences(
      Tables(spark, dir, "documents"), "doc_id", "text", seqLen = 512L)

  /** q_pack_spans: the attention-mask manifest of the 512-token tape —
    * per (sequence, document) the clipped in-sequence token span.
    */
  def packSpans(spark: SparkSession, dir: String): DataFrame =
    graft.text.Packing.packSpans(
      Tables(spark, dir, "documents"), "doc_id", "text", seqLen = 512L)
      .orderBy(col("seq_id"), col("start_in_seq"))

  /** q_export_manifest: the training-shard EXPORT flagship — the corpus
    * packed onto the 512-token tape, cut into 16-sequence shards,
    * WRITTEN as size-bounded partitioned parquet (the actual deliverable
    * of a training-data pipeline), and the manifest aggregated from
    * reading the files back ([[graft.ops.Export]]). Rebuilds the export
    * every call (this query times the full export); the manifest math is
    * all-integer, so the oracle recomputes it straight from the
    * documents table — a hash match proves tape → shard → file → read
    * round-trips exactly.
    */
  def exportManifest(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.ops.StageArtifacts.refresh(dir, "export") { o =>
      graft.ops.Export.writeShards(Tables(spark, dir, "documents"),
        seqLen = 512L, seqsPerShard = 16L, maxRecordsPerFile = 5000,
        s"$o/shards")
    }
    graft.ops.Export.manifestOf(spark.read.parquet(s"$stage/shards"))
  }

  /** No-split bin packing over the corpus: 512-token-capacity bins,
    * each document whole in one bin (see
    * [[graft.text.Packing.packBinsNoSplit]]).
    */
  def packBins(spark: SparkSession, dir: String): DataFrame =
    graft.text.Packing.packBinsNoSplit(
      Tables(spark, dir, "documents"), "doc_id", "text",
      capacity = 512L, buckets = 64)

  /** TF-IDF-family top terms: per document, the 5 tokens with the
    * highest tf × (N/df) rarity weight — term frequency times RAW
    * inverse document frequency. Raw (not log) IDF is a deliberate
    * cross-engine-exactness choice: tf·N/df is one correctly-rounded
    * double division of integers (both engines produce the identical
    * bit pattern; two distinct rationals at these magnitudes are never
    * within a ulp), whereas ln() may differ in the last ulp across
    * libm implementations and silently flip ranks. Ranking is identical
    * to log-idf ranking per document up to idf monotonicity.
    *
    * Shape: one groupBy(token) for document frequencies (the only
    * shuffle over token space), broadcast-or-shuffle join back, then a
    * per-doc top-k window — df table size is vocabulary-sized, tiny
    * relative to the corpus.
    */
  def topTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // metadata-only count (parquet row-group stats; no tokenize)
    val n = docs.count()
    // checkpoint barrier: the exploded (doc_id, token) relation feeds
    // BOTH the tf and df aggregations — without it the corpus tokenizes
    // twice (same tradeoff as Packing; the checkpoint is two narrow
    // columns per token and is collected once the result frame drops)
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
      .barrierOnce()
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(df_, "token")
      .withColumn("score",
        round((col("tf") * lit(n)).cast("double") / col("df").cast("double"), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
        col("score"))
  }

  /** Bigram language-model scoring — the CCNet/KenLM-style "perplexity
    * filter": train bigram counts ON the corpus itself, score every
    * document by its add-one-smoothed mean log-probability, keep the
    * fluent ones. The LM is two corpus-level count tables —
    * C(prev, w) and the prefix totals C(prev·) — built by map-side-
    * combinable groupBys on the gram keys, plus one distinct-vocab
    * scalar; scoring joins each document's bigrams to the counts ON
    * THOSE SAME KEYS (sort-merge at scale, nothing corpus-sized is ever
    * broadcast or collected).
    *
    * Cross-engine exactness: each per-bigram ln() is rounded to 6dp
    * FIRST and summed as an exact DECIMAL — a raw double sum would
    * depend on shuffle arrival order and could never hash-match the
    * DuckDB oracle (ln itself may differ in the last ulp across libms,
    * but a 1-ulp difference lands on a 0.5e-6 rounding boundary with
    * probability ~1e-9 per value; the suite accepts that, cf.
    * [[topTerms]] which avoids ln because it RANKS on the raw value).
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      // feeds the gram relation AND the vocab scalar: tokenize once
      .barrierOnce()
    val grams = docs
      .select(col("doc_id"), explode(TextOps.bigrams(col("toks"))).as("bigram"))
      .withColumn("prev", split(col("bigram"), " ").getItem(0))
    val cb = grams.groupBy("bigram").agg(count(lit(1)).as("cb"))
    val cp = grams.groupBy("prev").agg(count(lit(1)).as("cp"))
    val vocab = docs.select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    grams
      .join(cb, "bigram")
      .join(cp, "prev")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(
        log((col("cb") + 1).cast("double") / (col("cp") + col("v")).cast("double")),
        6).cast(DecimalType(18, 6)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"), sum(col("lp")).as("slp"))
      // deliberately NOT rounded: slp/n is a decimal-over-integer rational
      // that lands EXACTLY on 0.5e-6 midpoints, where Spark's string-based
      // HALF_UP and an exact-binary rounder disagree — the full-precision
      // IEEE quotient is identical in every engine, a re-round is not
      .withColumn("avg_logp",
        col("slp").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))
      .withColumn("keep", col("avg_logp") >= lit(-3.45))
      .select("doc_id", "n_bigrams", "avg_logp", "ppl", "keep")
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — the bigram-LM
    * instantiation): score every raw-corpus document by
    * log p_target(doc) − log p_raw(doc), where the TARGET LM trains on
    * the pinned target slice (doc_id % 10 == 3, the "domain sample")
    * and the RAW LM on the rest. Documents whose n-gram distribution
    * resembles the target score high and are kept for the
    * domain-focused mix; the weight is the per-bigram average log
    * ratio, so lengths do not bias the verdict.
    *
    * Exactness: both LMs use the add-1-smoothed 6dp-round-then-DECIMAL
    * contract of [[lmScore]]; the per-doc score sums DECIMAL
    * differences exactly and performs ONE double division, so the
    * keep threshold compares bit-identical values in both engines.
    * Unseen-in-target bigrams back off to the add-1 floor via
    * coalesce(0) left joins.
    *
    * Scale shape: the bigram relation materializes once and feeds the
    * two vocabulary-sized count tables and the scoring scan; scoring
    * is two bigram-keyed joins + two prev-keyed joins — all map-side
    * combinable aggregates and content-key shuffles, one corpus pass.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .barrierOnce()
    // feeds target counts, raw counts AND the scoring scan: explode once
    val grams = docs
      .select(col("doc_id"), explode(TextOps.bigrams(col("toks"))).as("bigram"))
      .withColumn("prev", split(col("bigram"), " ").getItem(0))
      .barrierOnce()
    val isTarget = col("doc_id") % 10 === 3
    val target = grams.filter(isTarget)
    val raw = grams.filter(!isTarget)
    val cbT = target.groupBy("bigram").agg(count(lit(1)).as("cb_t"))
    val cpT = target.groupBy("prev").agg(count(lit(1)).as("cp_t"))
    val cbR = raw.groupBy("bigram").agg(count(lit(1)).as("cb_r"))
    val cpR = raw.groupBy("prev").agg(count(lit(1)).as("cp_r"))
    val vT = docs.filter(isTarget).select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t")).as("v_t"))
    val vR = docs.filter(!isTarget).select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t")).as("v_r"))
    raw
      .join(cbT, Seq("bigram"), "left")
      .join(cpT, Seq("prev"), "left")
      .join(cbR, "bigram") // a raw bigram is always in the raw LM
      .join(cpR, "prev")
      .crossJoin(broadcast(vT))
      .crossJoin(broadcast(vR))
      .withColumn("lp_t", round(log(
        (coalesce(col("cb_t"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cp_t"), lit(0L)) + col("v_t")).cast("double")),
        6).cast(DecimalType(18, 6)))
      .withColumn("lp_r", round(log(
        (col("cb_r") + 1).cast("double") /
          (col("cp_r") + col("v_r")).cast("double")),
        6).cast(DecimalType(18, 6)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("lp_t") - col("lp_r")).as("sdiff"))
      // exact-decimal sum, then one IEEE division — bit-identical
      // cross-engine, so the keep cut has no threshold-margin hazard
      .withColumn("log_ratio",
        col("sdiff").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("keep", col("log_ratio") >= lit(-0.15))
      .select("doc_id", "n_bigrams", "log_ratio", "keep")
  }

  /** Per-source token-distribution drift vs the whole corpus — the
    * monitoring signal that catches a source whose content shifted
    * (new crawl snapshot, scraper regression, injected spam) before it
    * contaminates the training mix. Two divergences per source:
    *
    *  - KL(source ‖ corpus) = Σ_t (c_st/n_s)·ln(p_s(t)/p_c(t)),
    *    restricted to tokens the source contains (absent tokens
    *    contribute 0). Per-token log ratios go through the
    *    6dp-round-then-DECIMAL contract and are weighted by INTEGER
    *    counts, so the sum is an exact decimal; ONE double division by
    *    n_s at the end keeps the value bit-identical cross-engine.
    *  - Total variation = ½ Σ_t |p_s(t) − p_c(t)|, computed EXACTLY in
    *    integers over the common denominator n_s·n_c:
    *    Σ_{t∈source} |c_st·n_c − c_ct·n_s| plus the closed-form
    *    correction n_s·(n_c − Σ_{t∈source} c_ct) for tokens the source
    *    never emits — no pass over the full vocabulary per source.
    *
    * Scale shape: one explode pass → a (source, token) map-side-
    * combinable count, a token-keyed join against the vocabulary-sized
    * corpus counts, and a source-keyed final aggregate. Output is
    * |sources| rows.
    */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
    val st = toks.groupBy("source", "t").agg(count(lit(1)).as("c_st"))
      .barrierOnce() // feeds corpus counts, source totals AND the join
    val ct = st.groupBy("t").agg(sum(col("c_st")).as("c_ct"))
    val ns = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val nc = ct.agg(sum(col("c_ct")).as("n_c"))
    st
      .join(ct, "t")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nc))
      // ln((c_st·n_c)/(n_s·c_ct)) per token, 6dp-pinned, weighted by the
      // integer count so the aggregate stays exact
      .withColumn("lr", round(log(
        (col("c_st").cast(DecimalType(19, 0)) *
          col("n_c").cast(DecimalType(19, 0))).cast("double") /
          (col("n_s").cast(DecimalType(19, 0)) *
            col("c_ct").cast(DecimalType(19, 0))).cast("double")), 6)
        .cast(DecimalType(18, 6)))
      .groupBy("source")
      .agg(
        max(col("n_s")).as("n_tokens"),
        count(lit(1)).cast("long").as("distinct_tokens"),
        sum(col("c_st").cast(DecimalType(18, 0)) * col("lr")).as("klnum"),
        // cross-products in DECIMAL: c_st·n_c at the 100 TB scale this
        // scaladoc targets (n_c ~ 1e13+) would silently wrap a Long
        // multiply; (19,0)×(19,0) → DECIMAL(38,0) stays exact to 1e38
        sum(abs(col("c_st").cast(DecimalType(19, 0)) *
            col("n_c").cast(DecimalType(19, 0)) -
            col("c_ct").cast(DecimalType(19, 0)) *
            col("n_s").cast(DecimalType(19, 0))))
          .as("tvpresent"),
        sum(col("c_ct")).as("cct_sum"),
        max(col("n_c")).as("n_c"))
      .withColumn("kl",
        col("klnum").cast("double") / col("n_tokens").cast("double"))
      .withColumn("tv",
        (col("tvpresent") +
          col("n_tokens").cast(DecimalType(19, 0)) *
            (col("n_c") - col("cct_sum")).cast(DecimalType(19, 0)))
          .cast("double") /
          (lit(2.0) * col("n_tokens").cast("double") * col("n_c").cast("double")))
      .select(col("source"), col("n_tokens"), col("distinct_tokens"),
        col("kl"), col("tv"))
  }

  /** Windowed PMI co-occurrence statistics — the word2vec/PPMI
    * preprocessing pass: unordered token pairs within a 3-token sliding
    * window, scored ln(p(a,b) / (p(a)·p(b))) with p(a,b) from the pair
    * multiset and p(·) from unigram counts. Corpus-level: one
    * map-side-combinable groupBy over pair space (the only big
    * shuffle), two vocabulary-sized joins for the marginals, two scalar
    * totals. Pairs below 5 occurrences are dropped (the standard noise
    * floor — at 100 TB it also bounds output to the frequent-pair
    * set). ln is rounded to 6dp (ulp analysis at [[lmScore]]).
    */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      // feeds pair counts AND unigram counts: tokenize once
      .barrierOnce()
    // grouped pair counts computed ONCE (the windowed explode is the
    // dominant cost); the scalar total derives from the grouped counts
    // — pinned so the count and total branches cannot re-explode
    val pairCounts = docs
      .select(explode(TextOps.cooccurrences(col("toks"), 3)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c_ab"))
      .barrierOnce()
    val pairs = pairCounts
      .filter(col("c_ab") >= 5)
      .withColumn("tok_a", split(col("pair"), " ").getItem(0))
      .withColumn("tok_b", split(col("pair"), " ").getItem(1))
    val uni = docs.select(explode(col("toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val tPairs = pairCounts.agg(sum(col("c_ab")).as("t_pairs"))
    val tUni = uni.agg(sum(col("c")).as("t_uni"))
    pairs
      .join(uni.select(col("t").as("tok_a"), col("c").as("c_a")), "tok_a")
      .join(uni.select(col("t").as("tok_b"), col("c").as("c_b")), "tok_b")
      .crossJoin(broadcast(tPairs))
      .crossJoin(broadcast(tUni))
      .withColumn("pmi", round(log(
        (col("c_ab").cast("double") / col("t_pairs").cast("double")) /
          ((col("c_a").cast("double") / col("t_uni").cast("double")) *
            (col("c_b").cast("double") / col("t_uni").cast("double")))), 6))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("pmi"))
  }

  /** Deterministic train/val/test split: assignment is a pure function
    * of document CONTENT (rolling hash mod 100 → 90/5/5), so the split
    * is reproducible across runs, clusters, and ingestion orders, and a
    * re-crawled duplicate lands in the same split (no train/test leak
    * through re-ingestion). Narrow pass, no shuffle.
    */
  /** T10's split key (content rolling-hash mod 100) and 90/5/5 rule —
    * the ONE definition; the leakage-safe split (T21) applies the same
    * rule to the cluster representative's text, and its "singletons
    * reduce exactly to T10" invariant holds only while these stay
    * single-sourced.
    */
  private[queries] def splitKey(text: Column): Column =
    pmod(TextOps.rollingHash(TextOps.normalize(text)), lit(100))

  private[queries] def splitName(h: Column): Column =
    when(h < 90, "train").when(h < 95, "val").otherwise("test")

  def splitAssign(spark: SparkSession, dir: String): DataFrame = {
    val h = splitKey(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), h.cast("long").as("h_mod"),
        splitName(h).as("split"))
  }

  /** PII scrubbing — the corpus hygiene pass every shipped training set
    * runs: emails, IPv4s and phone numbers are redacted to typed tokens
    * with per-category counts. The synthetic corpus contains no PII, so
    * the query PLANTS deterministic PII first (pure doc_id arithmetic —
    * both engines construct the identical input) and the oracle checks
    * the full redaction pipeline, not a no-op. Categories redact in
    * [[TextOps.piiPatterns]] order (emails before IPs before phones —
    * see the ordering note there), each category counted on the text
    * the previous one already redacted. Narrow scan-stage pass.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" contact alice.smith@example.com or bob@mail.org now"))
        .otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        lit(" call +1 415 555-0133 today")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        lit(" server at 192.168.10.25 port 8080")).otherwise(lit("")))
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), planted.as("t0"))
    val (redacted, counts) = TextOps.piiPatterns
      .foldLeft((col("t0"), Seq.empty[(String, org.apache.spark.sql.Column)])) {
        case ((text, acc), (name, pattern, token)) =>
          val (n, out) = TextOps.redact(text, pattern, token)
          (out, acc :+ (s"n_$name" -> n))
      }
    base.select(
      col("doc_id") +:
        counts.map { case (n, c) => c.as(n) } :+
        redacted.as("redacted"): _*)
  }

  /** Document fingerprints: order-sensitive rolling hash of the
    * normalized text + order-independent bag-of-words hash. Exact dedup
    * at 100 TB groups on these 8-byte keys instead of comparing bodies.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextOps.rollingHash(TextOps.normalize(col("text"))).as("content_hash"),
        TextOps.bagHash(toks).as("bag_hash"))
  }

  /** q_novelty: per-document novel-trigram ratio — the fraction of a
    * doc's distinct 3-grams that appear in NO other document. The
    * corpus-diversity metric (self-BLEU's set-based cousin): a corpus
    * whose novelty collapses is near-duplicating itself even when no
    * pair crosses the dedup threshold. Integer counting + one exact
    * division — fully oracled. Docs under 3 tokens have no trigrams and
    * drop out (both engines).
    *
    * Scale: one explode + a shingle-keyed document-frequency aggregate
    * (the same content-key shuffle the dedup family uses) + a doc-keyed
    * rollup.
    */
  def novelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
    val df_ = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(df_, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("df") === 1).cast("long")).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** q_char_entropy: character-distribution entropy of the normalized
    * text, −Σ p·ln p — the gibberish/compression quality signal (too
    * LOW = repeated characters or machine spam, too HIGH = random
    * noise; natural language sits in a band). Cross-engine exactness
    * uses the [[lmScore]] contract: each per-character term rounds to
    * 6dp and sums as an exact DECIMAL, so partial-aggregation order
    * can't perturb the result. One explode + two doc-keyed aggregates.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.normalize(col("text")).as("t"))
    val counts = docs
      .select(col("doc_id"), explode(split(col("t"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("k"))
    val totals = counts.groupBy(col("doc_id")).agg(sum(col("k")).as("n"))
    counts.join(totals, "doc_id")
      .withColumn("p", col("k").cast("double") / col("n").cast("double"))
      .withColumn("term",
        round(col("p") * log(col("p")), 6).cast(DecimalType(18, 6)))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("long").as("n_chars"),
        (-sum(col("term"))).cast("double").as("entropy"))
  }

  /** q_bpe_train: 20 BPE merges trained on the corpus word-frequency
    * table — the merge table (rank, left, right, n) IS the tokenizer
    * vocabulary artifact. Deterministic (argmax by count desc then
    * lexicographic), but the loop is data-dependent so there is no
    * static SQL oracle; BpeSpec pins it against a from-scratch scalar
    * BPE trainer exactly.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.train(
      graft.text.Bpe.wordCounts(Tables(spark, dir, "documents"), "text"),
      merges = 20)

  /** q_bpe_train_batched: the corpus trained TO EXHAUSTION (this
    * vocabulary sustains 105 merges) through the BATCHED trainer — one
    * distributed pair-count pass per batch of merges instead of per
    * merge ([[graft.text.Bpe.trainBatched]]; provably identical to the
    * sequential argmax, BpeSpec pins table-for-table parity at 200
    * merges incl. the exhaustion point). The genuine-capability path
    * for real tokenizers: 30k merges is 30k jobs sequentially, a few
    * hundred batched.
    */
  def bpeTrainBatched(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainBatched(
      graft.text.Bpe.wordCounts(Tables(spark, dir, "documents"), "text"),
      merges = 200)

  /** q_bpe_train_incremental: the corpus trained to exhaustion through
    * the INCREMENTAL-DELTA trainer ([[graft.text.Bpe.trainIncremental]])
    * — identical merge table to q_bpe_train_batched (BpeSpec pins all
    * three trainers table-for-table), but each round's full-vocabulary
    * pair recount is replaced by exact driver-held counts maintained
    * from changed-rows-only deltas and a lazy-deletion argmax heap.
    * The per-ROUND cost fix the r16 batched measurement named: at 30k
    * merges the vocabulary-wide explode+shuffle per round is the bill,
    * and this pays it only for words an accepted merge actually
    * touched.
    */
  def bpeTrainIncremental(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainIncremental(
      graft.text.Bpe.wordCounts(Tables(spark, dir, "documents"), "text"),
      merges = 200)

  /** q_bpe_train_auto: the corpus trained to exhaustion through the
    * vocabulary-size-gated trainer ([[graft.text.Bpe.trainAuto]]) —
    * the DRIVER path at every oracled SF (the distinct-word table is
    * vocabulary-sized), with [[graft.text.Bpe.trainIncremental]] as
    * the spill-over above the bound. Identical merge table to the
    * other three trainers (BpeSpec pins all four table-for-table);
    * what it removes is the per-round Spark JOB LATENCY, which after
    * r16's incremental trainer was the entire remaining 30k-merge
    * cost (~12k rounds × ~0.45 s ≈ 1.5 h of scheduling).
    */
  def bpeTrainAuto(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainAuto(
      graft.text.Bpe.wordCounts(Tables(spark, dir, "documents"), "text"),
      merges = 200)

  /** q_bpe_encode: per-document BPE token counts under the trained
    * vocabulary — train on the distinct-word table, encode each
    * distinct word once, join counts back to documents.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val merges = graft.text.Bpe.train(
        graft.text.Bpe.wordCounts(docs, "text"), merges = 20)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.text.Bpe.encodeStats(docs, "doc_id", "text", merges)
  }

  /** q_bpe_fixture: per-document BPE token counts over the PINNED
    * fixture corpus under the PINNED merge table
    * ([[graft.text.BpeFixture]]) — the hash-matched twin of
    * q_bpe_train/q_bpe_encode: the engine tokenizes the fixture docs
    * and applies the real greedy merge folds ([[graft.text.Bpe
    * .encodeStats]]); DuckDB replays the stats from the pinned per-word
    * encodings (BpeSpec drift-guards the pins against both the
    * distributed trainer and the from-scratch scalar reference).
    */
  def bpeFixture(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.encodeStats(graft.text.BpeFixture.df(spark),
      "doc_id", "text", graft.text.BpeFixture.mergePairs)

  /** Vocabulary coverage curve — what fraction of all corpus tokens the
    * top-k most frequent types cover, at k = 5 / 10 / 20
    * (the synthetic corpus has a 31-type vocabulary; at real scale the
    * interesting boundaries are 1e3–1e5 and only `ks` changes). The stat
    * behind tokenizer-vocab sizing and stopword-list choice: a corpus
    * whose top-1000 types cover 95% of tokens tokenizes very
    * differently from one where they cover 40%.
    *
    * Scale shape: one tokenize pass into a map-side-combinable type
    * count (the vocabulary-sized shuffle every T-family query pays),
    * then distributed top-k (TakeOrderedAndProject — k is bounded, the
    * full vocabulary is never globally sorted); the cumulative window
    * runs over ≤ max-k rows. All integer until the one final division;
    * ties ordered (count DESC, token) so the k-th boundary is
    * deterministic cross-engine.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val ks = Seq(5, 10, 20).map(_.toLong)
    val counts = Tables(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .barrierOnce() // feeds the total AND the top-k
    val total = counts.agg(sum(col("c")).as("total_tokens"))
    val byFreq = Window.orderBy(col("c").desc, col("t"))
    counts.orderBy(col("c").desc, col("t")).limit(ks.max.toInt)
      .withColumn("k", row_number().over(byFreq).cast("long"))
      .withColumn("covered_tokens", sum(col("c")).over(
        byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("k").isin(ks: _*))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered_tokens"), col("total_tokens"),
        (col("covered_tokens").cast("double") /
          col("total_tokens").cast("double")).as("coverage"))
  }
}
