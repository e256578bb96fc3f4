package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs(
    1 -> "the quick brown fox jumps over the lazy dog near the river bank today",
    2 -> "the quick brown fox jumps over the lazy dog near the river bank tonight", // near-dup of 1
    3 -> "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK TODAY!", // exact dup of 1 (normalized)
    4 -> "completely different content about spark query engines and shuffles at scale",
    5 -> "another unrelated document mentioning joins aggregates and window functions")

  test("exactGroups collapses normalized-identical docs to the min id") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text").collect()
    assert(g.length == 4) // 1+3 merge
    val merged = g.find(_.getAs[Long]("n_copies") == 2).get
    assert(merged.getAs[Int]("canonical_id") == 1)
  }

  test("jaccardPairs finds the near-dup pair and nothing else") {
    val p = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Int]("a_id"), r.getAs[Int]("b_id"))).toSet
    // 1~2 and 1~3 and 2~3 are high-overlap; 4,5 must not appear
    assert(p.contains((1, 2)) && p.contains((1, 3)))
    assert(!p.exists { case (a, b) => a >= 4 || b >= 4 })
  }

  test("minhashLshPairs agrees with exact jaccardPairs") {
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.5, nHashes = 128, nBands = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(lsh == exact)
  }

  test("simhash: identical docs distance 0, near-dups close, unrelated far") {
    val h = corpus.select(col("doc_id"),
      Dedup.simhash(graft.text.TextOps.tokens(col("text"))).as("h"))
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Long]("h")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1), h(3)) == 0) // normalized-identical
    // short docs are noisy in absolute terms; the invariant is relative:
    // a one-token edit stays far closer than unrelated content
    assert(ham(h(1), h(2)) < ham(h(1), h(4)))
    assert(ham(h(1), h(2)) < ham(h(1), h(5)))
  }

  test("simhashPairs surfaces only low-hamming pairs, deduped across chunks") {
    val p = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Int]("a_id"), r.getAs[Int]("b_id")))
    assert(p.toSet.size == p.length) // chunk join introduced no duplicates
    assert(p.contains((1, 3)))
    assert(!p.exists { case (a, b) => a >= 4 || b >= 4 })
  }

  test("duplicateClusters: transitive near-dups share one min-id label") {
    // 1-2 and 2-6 are near-dups but 1-6 may not pair directly: the
    // component {1,2,6} must still collapse to label 1 transitively
    val chain = docs(
      1 -> "the quick brown fox jumps over the lazy dog near the river bank today",
      2 -> "the quick brown fox jumps over the lazy dog near the river bank tonight",
      6 -> "a quick brown fox jumps over the lazy dog near the river bank tonight",
      4 -> "completely different content about spark query engines and shuffles at scale")
    // nBands=64 (2 rows/band): at this test's J≈0.6 pairs the default
    // 32×4 banding would miss with p≈1e-2 — the production t=0.8 default
    // keeps 32×4 (miss < 5e-8 there)
    val labels = Dedup.duplicateClusters(chain, "doc_id", "text",
      n = 3, threshold = 0.5, nBands = 64)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id")).toMap
    assert(labels(1) == 1 && labels(2) == 1 && labels(6) == 1)
    assert(labels(4) == 4) // singleton keeps its own id
  }

  test("duplicateClusters: exact-text contraction — labels identical to " +
      "the full pair relation, edges linear in duplicate multiplicity") {
    // the text twin of the mm phashClusterEdges equivalence pin: a
    // duplicate-HEAVY corpus (40 exact copies of one doc, 25 of a
    // near-dup of it, equal sub-n-token docs that must stay singletons)
    // where the uncontracted banded relation carries C(40,2)+C(25,2)
    // + 40·25 = 2,080 pairs and the contracted edge set stays linear
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val heavy = docs(
      (1 to 40).map(i => i -> base) ++
        (41 to 65).map(i => i -> near) ++
        Seq(70 -> "tiny doc", 71 -> "tiny doc", // < n tokens: singletons
          80 -> "completely different content about spark query engines and shuffles at scale"): _*)
    // full-relation reference: banded pairs over the UNCONTRACTED corpus
    val fullPairs = Dedup.minhashLshPairs(heavy, "doc_id", "text",
      n = 3, threshold = 0.8)
    val expected = Dedup.clusterLabels(heavy, "doc_id", fullPairs)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id"))
      .toMap
    val got = Dedup.duplicateClusters(heavy, "doc_id", "text",
      n = 3, threshold = 0.8)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id"))
      .toMap
    assert(got == expected)
    // the corpus collapses as built: one 65-doc component rooted at 1
    // (base↔near jaccard ≥ 0.8 at these texts), tiny docs singletons
    assert((1 to 65).forall(i => got(i) == 1))
    assert(got(70) == 70 && got(71) == 71 && got(80) == 80)
    // edge linearity: 39 + 24 star edges + 1 rep-rep near edge — vs
    // the full relation's 2,080 verified pairs
    val edges = Dedup.textClusterEdges(heavy, "doc_id", "text",
      n = 3, threshold = 0.8, nHashes = 128, nBands = 32).count()
    assert(edges == 64L, s"contracted edges: $edges")
    assert(fullPairs.count() == 2080L)
  }

  test("cosineClusterEdges: exact-vector contraction — labels identical " +
      "to the full pair relation, edges linear in multiplicity") {
    import spark.implicits._
    // 30 copies of one vector, 20 of a near-dup of it (cosine ≈ 0.995),
    // equal ZERO vectors (must stay singletons — they never pair), and
    // one far-away vector
    val a = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Seq(0.995f, 0.0999f, 0.0f, 0.0f) // cos(a,b) ≈ 0.995
    val far = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val zero = Seq(0.0f, 0.0f, 0.0f, 0.0f)
    val vecs = ((1 to 30).map(i => i.toLong -> a) ++
      (31 to 50).map(i => i.toLong -> b) ++
      Seq(60L -> zero, 61L -> zero, 70L -> far)).toDF("vec_id", "embedding")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.cosinePairsBlocked(df, "vec_id", "embedding", threshold = 0.9)
    val fullPairs = pairsOf(vecs).select(col("a_id"), col("b_id"))
    val expected = Dedup.clusterLabels(vecs, "vec_id", fullPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Dedup.cosineClusterEdges(vecs, "vec_id", "embedding", pairsOf)
    val got = Dedup.clusterLabels(vecs, "vec_id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert((1 to 50).forall(i => got(i.toLong) == 1L))
    assert(got(60L) == 60L && got(61L) == 61L && got(70L) == 70L)
    // 29 + 19 star edges + 1 rep-rep near edge — vs C(30,2) + C(20,2)
    // + 30·20 = 1,225 full pairs
    assert(edges.count() == 49L)
    assert(fullPairs.count() == 1225L)
  }

  test("multiplicity gate: on an all-unique corpus the contraction is " +
      "skipped and labels still equal the full relation") {
    import spark.implicits._
    // CLEAN corpora (no exact dups) are where the r16 contraction paid
    // its +40-77% premium for nothing; the r17 gate must (a) take the
    // skip branch — pinned via contractionProfile's ContractionStats —
    // and (b) leave the label relation bit-identical to the full one.
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val uniq = docs((1 to 12).map(i => i -> s"$base variant $i") ++
      Seq(20 -> "tiny", // < n tokens: never eligible
        30 -> "completely different content about spark query engines"): _*)
    val eligibleKeys = uniq
      .select(col("doc_id").as("doc"), xxhash64(col("text")).as("h1"),
        xxhash64(lit(1L), col("text")).as("h2"))
    val stats = Dedup.contractionProfile(eligibleKeys, Seq("h1", "h2"))
    assert(stats == Dedup.ContractionStats(1L, 14L, 0L))
    assert(!stats.contract)
    val fullPairs = Dedup.minhashLshPairs(uniq, "doc_id", "text",
      n = 3, threshold = 0.8)
    val expected = Dedup.clusterLabels(uniq, "doc_id", fullPairs)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id"))
      .toMap
    val got = Dedup.duplicateClusters(uniq, "doc_id", "text",
      n = 3, threshold = 0.8)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id"))
      .toMap
    assert(got == expected)
    // cosine family, all-unique vectors: same gate, same equivalence
    val vecs = (1 to 8).map(i =>
      i.toLong -> Seq(1.0f, i * 0.001f, 0.0f, 0.0f))
      .toDF("vec_id", "embedding")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.cosinePairsBlocked(df, "vec_id", "embedding", threshold = 0.9)
    val fullCos = pairsOf(vecs).select(col("a_id"), col("b_id"))
    val expCos = Dedup.clusterLabels(vecs, "vec_id", fullCos)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotCos = Dedup.clusterLabels(vecs, "vec_id",
      Dedup.cosineClusterEdges(vecs, "vec_id", "embedding", pairsOf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCos == expCos)
    // an empty eligible frame reads all-zero stats and takes the same branch
    val statsE = Dedup.contractionProfile(
      eligibleKeys.filter(lit(false)), Seq("h1", "h2"))
    assert(statsE == Dedup.ContractionStats(0L, 0L, 0L))
    assert(!statsE.contract)
  }

  test("duplicate-MASS gate: linear-bounded dup groups (k = 2, the " +
      "driver-corpus shape) SKIP the contraction; labels still equal " +
      "the full relation; heavy multiplicity still contracts") {
    // The r17 maxK<=1 gate never fired on the driver corpora — they
    // carry planted k = 2 exact-text pairs at every sf, so every
    // benched cluster build paid the contraction premium for a
    // Σk(k−1) = 2·G₂ fan-out the banded path absorbs for free. The
    // MASS gate (contract iff Σk(k−1) > Σk) must (a) skip here, (b)
    // keep labels identical WITH the exact pair present (the banded
    // path finds equal texts at Jaccard 1 in every band), (c) still
    // contract the 40-copy corpus above.
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val mild = docs((1 to 10).map(i => i -> s"$base variant number $i") ++
      Seq(11 -> s"$base variant number 3", // exact copy of doc 3 (k = 2)
        12 -> s"$base variant number 7", // exact copy of doc 7 (k = 2)
        30 -> "completely different content about spark query engines"): _*)
    val keys = mild
      .select(col("doc_id").as("doc"), xxhash64(col("text")).as("h1"),
        xxhash64(lit(1L), col("text")).as("h2"))
    val sm = Dedup.contractionProfile(keys, Seq("h1", "h2"))
    assert(sm == Dedup.ContractionStats(2L, 13L, 4L))
    assert(!sm.contract, "k = 2 groups are linear-bounded: skip")
    val fullPairs = Dedup.minhashLshPairs(mild, "doc_id", "text",
      n = 3, threshold = 0.8)
    val expected = Dedup.clusterLabels(mild, "doc_id", fullPairs)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id"))
      .toMap
    val got = Dedup.duplicateClusters(mild, "doc_id", "text",
      n = 3, threshold = 0.8)
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Int]("cluster_id"))
      .toMap
    assert(got == expected)
    // the exact copies must land with their originals in BOTH paths
    assert(got(11) == got(3) && got(12) == got(7))
    // heavy multiplicity (the 40+25 corpus of the contraction pin
    // above): Σk(k−1) = 40·39 + 25·24 = 2160 over 66 eligible rows —
    // the quadratic regime must still contract
    val heavy = docs(
      (1 to 40).map(i => i -> base) ++
        (41 to 65).map(i => i ->
          (base + " tonight")) ++
        Seq(80 -> "completely different content about spark query engines at scale"): _*)
    val hKeys = heavy
      .select(col("doc_id").as("doc"), xxhash64(col("text")).as("h1"),
        xxhash64(lit(1L), col("text")).as("h2"))
    val sh = Dedup.contractionProfile(hKeys, Seq("h1", "h2"))
    assert(sh == Dedup.ContractionStats(40L, 66L, 2160L))
    assert(sh.contract, "super-linear fan-out: contract")
  }

  test("mega-group guard: one k≈√N group below the mass threshold " +
      "still contracts once it alone exceeds the per-task pair cap") {
    // ADVICE r17: a single group of k ≈ √N exact copies in an
    // otherwise-clean corpus reads Σk(k−1) ≈ N (mass gate: skip) yet
    // its k(k−1)/2 clique pairs land on ONE (band, bucket) task per
    // band — the r15 sf10 single-task sort/OOM shape. Policy table on
    // ContractionStats directly (the profile math is pinned above):
    val cap = Dedup.ContractionStats.PerTaskPairCap
    // 2,000-copy group in a 10M-row corpus: fanout 3.998M < 10M rows,
    // so the mass clause skips — the guard must contract anyway
    val mega = Dedup.ContractionStats(2000L, 10000000L, 2000L * 1999L)
    assert(mega.pairFanout < mega.rows && mega.contract,
      "mega-group below mass threshold must still contract")
    // boundary: k = 1024 sits just under the 2^20 cap (1024·1023 =
    // 1,047,552), k = 1025 just over (1025·1024 = 1,049,600)
    assert(1024L * 1023L <= cap && 1025L * 1024L > cap)
    assert(!Dedup.ContractionStats(1024L, 10000000L, 1024L * 1023L).contract)
    assert(Dedup.ContractionStats(1025L, 10000000L, 1025L * 1024L).contract)
    // the driver-corpus shape (k = 2 pairs) and the clean corpus are
    // untouched by the guard
    assert(!Dedup.ContractionStats(2L, 13L, 4L).contract)
    assert(!Dedup.ContractionStats(1L, 14L, 0L).contract)
    // and the mass clause still dominates when both fire
    assert(Dedup.ContractionStats(40L, 66L, 2160L).contract)
  }

  test("connectedComponents: long chain and multi-component graphs collapse to min roots") {
    import spark.implicits._
    // a 10-node chain (worst case for naive propagation), a triangle
    // with a pendant, and an isolated edge — all as (a_id < b_id) pairs
    val chain = (1 to 9).map(i => (i.toLong, (i + 1).toLong))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L))
    val iso = Seq((30L, 31L))
    val pairs = (chain ++ tri ++ iso).toDF("a_id", "b_id")
    val stars = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- 2 to 10) assert(stars(n.toLong) == 1L, s"chain node $n")
    for (n <- Seq(21L, 22L, 23L)) assert(stars(n) == 20L, s"triangle node $n")
    assert(stars(31L) == 30L)
    assert(!stars.contains(1L) && !stars.contains(20L) && !stars.contains(30L),
      "roots must not appear on the non-root side of a star edge")
  }

  test("simhash64 (packed aggregates) is bit-identical to the HOF simhash") {
    val hof = corpus.select(col("doc_id"),
      Dedup.simhash(graft.text.TextOps.tokens(col("text"))).as("h"))
      .collect().map(r => r.getAs[Int]("doc_id") -> r.getAs[Long]("h")).toMap
    val packed = Dedup.simhash64(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Int]("doc") -> r.getAs[Long]("sh64")).toMap
    assert(packed == hof)
  }

  test("SimhashFixture pins: engine simhash64 matches the pinned sh64 values") {
    // the q_simhash_fixture DuckDB oracle recomputes the pair relation
    // from SimhashFixture.sh64 — if the engine's simhash ever drifts
    // from the pinned values, THIS fails (not the oracle, silently)
    val computed = Dedup.simhash64(SimhashFixture.df(spark), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(computed == SimhashFixture.sh64.toMap)
  }

  test("simhash64: worst-case repeated-token doc aggregates without overflow; oversized doc gets the cap error") {
    import spark.implicits._
    // 16,000 identical tokens stress every lane of the packed sums at
    // once (cnt_j = n for every set bit) — the shape that overflowed a
    // 16-bit-lane design at bit 48 before the 16,383-token cap
    val heavy = Seq((1, Seq.fill(16000)("spark").mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.simhash64(heavy, "doc_id", "text").collect().length == 1)
    val over = Seq((2, Seq.fill(16384)("x").mkString(" "))).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.simhash64(over, "doc_id", "text").collect()
    }
    // the FRIENDLY cap error, not ANSI ARITHMETIC_OVERFLOW mid-aggregate
    assert(e.getMessage.contains("chunk upstream"), e.getMessage)
  }

  test("cosinePairsBucketed returns the empty relation on an empty vector table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.cosinePairsBucketed(empty, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("cosinePairsBucketed and cosinePairsBlocked equal the all-pairs reference on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Dedup.cosinePairs(emb, "vec_id", "embedding", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bucketed = Dedup.cosinePairsBucketed(emb, "vec_id", "embedding",
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Dedup.cosinePairsBlocked(emb, "vec_id", "embedding",
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(bucketed == exact)
    assert(blocked == exact)
  }

  test("embedNearDupSelective: LSH candidates + exact verify find EVERY " +
      "planted twin pair at t=0.9, nothing else") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = graft.queries.DedupQ.embedNearDupSelective(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val planted = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 10 === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(planted.nonEmpty, dir)
      // exactly one pair per planted twin: (v, v + 1e7), cosine well
      // inside (0.9, 1) — the +0.01 shift moves it off the trivial 1.0
      assert(got.map(t => (t._1, t._2)).toSet ==
        planted.map(v => (v, v + 10000000L)), dir)
      assert(got.forall(t => t._3 > 0.99 && t._3 < 1.0), dir)
    }
  }

  test("incrementalCosineNearDup: persisted-index probe == the full " +
      "selective relation; batch-internal dups surface too") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val full = graft.queries.DedupQ.embedNearDupSelective(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inc = graft.queries.DedupQ.embedNearDupIncremental(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(full.nonEmpty, dir)
      assert(inc == full, dir)
    }
    // batch-internal near-dups go through the self-join branch: a batch
    // carrying two near-identical NEW vectors must pair them even
    // though neither is in the corpus index
    import spark.implicits._
    val corpus = Seq((1L, Array.fill(8)(0.5)), (2L, Array.tabulate(8)(i =>
      if (i % 2 == 0) 1.0 else -1.0))).toDF("vec_id", "embedding")
    val batch = Seq((10L, Array.fill(8)(0.7)), (11L, Array.fill(8)(0.71)))
      .toDF("vec_id", "embedding")
    val idx = graft.dedup.Dedup.cosineBucketIndex(corpus, "vec_id",
      "embedding", tables = 8, bitsPerTable = 4)
    val got = graft.dedup.Dedup.incrementalCosineNearDup(batch, corpus, idx,
      "vec_id", "embedding", threshold = 0.9, tables = 8, bitsPerTable = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (10, 11) is the batch-internal pair; (1, 10)/(1, 11) are
    // cross pairs (constant vectors are cosine-1 to each other)
    assert(got == Set((10L, 11L), (1L, 10L), (1L, 11L)), got.toString)
  }

  test("adaptiveBits: floor 16, then ceil(log2 N) + 2 slack, capped at 48") {
    assert(Dedup.adaptiveBits(0L) == 16)
    assert(Dedup.adaptiveBits(1L) == 16)
    assert(Dedup.adaptiveBits(2000L) == 16)   // sf0.1 — floor, unchanged
    assert(Dedup.adaptiveBits(2200L) == 16)   // selective corpus at sf0.1
    assert(Dedup.adaptiveBits(1L << 14) == 16) // 2^14 is the floor edge
    assert(Dedup.adaptiveBits((1L << 14) + 1) == 17)
    assert(Dedup.adaptiveBits(22000L) == 17)  // sf1
    assert(Dedup.adaptiveBits(220000L) == 20) // sf10 — the r14 defect zone
    assert(Dedup.adaptiveBits(1L << 30) == 32)
    assert(Dedup.adaptiveBits(Long.MaxValue) == 48) // Long-safety cap
    // a custom floor floors (the spec-scale/test hook)
    assert(Dedup.adaptiveBits(6L, floor = 2) == 5)
    assert(Dedup.adaptiveBits(3L, floor = 2) == 4)
    assert(Dedup.adaptiveBits(2L, floor = 2) == 3)
  }

  test("cosinePairsBucketed at a WIDER adaptive width equals the 16-bit " +
      "relation (recall survives the r15 re-sizing) on planted twins") {
    // the exact contract the scale fix must not break: selective pairs
    // at the width sf10 would choose (18–20 bits) == the floor-width
    // relation == the planted ground truth
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), org.apache.spark.sql.functions.transform(
        col("embedding"), _.cast("double")).as("embedding"))
    val twins = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _ + lit(0.01)).as("embedding"))
    val corpus = emb.unionByName(twins)
    def pairs(bits: Int) = Dedup.cosinePairsBucketed(corpus, "vec_id",
      "embedding", threshold = 0.9, tables = 24, bitsPerTable = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val at16 = pairs(16)
    assert(at16.nonEmpty)
    assert(pairs(20) == at16)
  }

  test("writeCosineIndex: meta round-trips, a meta-driven probe equals the " +
      "full relation, and a meta-less legacy dir reads None") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), org.apache.spark.sql.functions.transform(
        col("embedding"), _.cast("double")).as("embedding"))
    val batch = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _ + lit(0.01)).as("embedding"))
    val root = java.nio.file.Files.createTempDirectory("cosidx_meta").toString
    val written = Dedup.writeCosineIndex(emb, "vec_id", "embedding",
      s"$root/index")
    val meta = Dedup.readCosineIndexMeta(spark, s"$root/index")
    assert(meta.contains(written))
    assert(written.n == emb.count() && written.bits == 16) // floor at 500
    // the meta file is invisible to the parquet reader AND the probe at
    // meta's params finds every planted pair
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.columns.toSet == Set("doc", "table", "bucket"))
    val got = Dedup.incrementalCosineNearDup(batch, emb, idx, "vec_id",
      "embedding", threshold = 0.9, tables = written.tables,
      bitsPerTable = written.bits, seed = written.seed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedSources = emb.filter(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == plantedSources.map(v => (v, v + 10000000L)))
    // legacy (pre-meta) artifact: bare parquet, no _graft_cosidx_meta
    idx.write.mode("overwrite").parquet(s"$root/legacy")
    assert(Dedup.readCosineIndexMeta(spark, s"$root/legacy").isEmpty)
  }

  test("rebuildCosineIndexSwap: the swapped dir holds the wider-width rows " +
      "and their meta as one unit") {
    import spark.implicits._
    val vecs = (1L to 12L).map(i =>
      (i, Array.tabulate(8)(j => if (j == (i % 8).toInt) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("cosidx_swap").toString
    val dir = s"$root/index"
    val first = Dedup.writeCosineIndex(vecs.limit(3), "vec_id", "embedding",
      dir, tables = 4, floorBits = 2)
    assert(first.bits == 4) // ceil(log2 3) + 2 slack at floor 2
    val resized = Dedup.rebuildCosineIndexSwap(vecs, "vec_id", "embedding",
      dir, tables = 4, floorBits = first.bits)
    assert(resized.bits == 6 && resized.n == 12) // ceil(log2 12) + 2
    assert(Dedup.readCosineIndexMeta(spark, dir).contains(resized))
    val swapped = spark.read.parquet(dir)
    val fresh = Dedup.cosineBucketIndex(vecs, "vec_id", "embedding",
      tables = 4, bitsPerTable = 6)
    assert(swapped.except(fresh).isEmpty && fresh.except(swapped).isEmpty)
    // no residue from the two-rename choreography
    assert(!new java.io.File(dir + "__tmp").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("writeCosineIndex commits atomically (no __build residue) and a " +
      "corrupt meta fails loudly instead of a silent legacy fallback") {
    import spark.implicits._
    val vecs = (1L to 5L).map(i =>
      (i, Array.tabulate(8)(j => if (j == (i % 8).toInt) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("cosidx_crash").toString
    val dir = s"$root/index"
    Dedup.writeCosineIndex(vecs, "vec_id", "embedding", dir, tables = 4)
    assert(!new java.io.File(dir + "__build").exists(),
      "temp build dir must not survive a successful commit")
    assert(Dedup.readCosineIndexMeta(spark, dir).isDefined)
    // a crash between meta create and write/close leaves an EMPTY meta:
    // that must throw a descriptive error, never parse as legacy params
    // (written through the Hadoop fs, exactly as the crashed writer
    // would have — keeps the local fs checksum sidecar consistent)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaPath = new org.apache.hadoop.fs.Path(dir, "_graft_cosidx_meta")
    def putMeta(content: String): Unit = {
      val out = fs.create(metaPath, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    putMeta("")
    val e1 = intercept[IllegalStateException] {
      Dedup.readCosineIndexMeta(spark, dir)
    }
    assert(e1.getMessage.contains("corrupt cosine index meta"))
    putMeta("4\tnotanint\t42\t5\n")
    val e2 = intercept[IllegalStateException] {
      Dedup.readCosineIndexMeta(spark, dir)
    }
    assert(e2.getMessage.contains("corrupt cosine index meta"))
  }

  test("incrementalNearDup equals the full-corpus pairs restricted to the batch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val rest = docs.filter(col("doc_id") % 7 =!= 0)
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => batchIds(a) || batchIds(b) }.toSet
    val inc = Dedup.incrementalNearDup(batch, rest,
      Dedup.minhashIndex(rest, "doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full.nonEmpty) // the differential is vacuous otherwise
    assert(inc == full)
  }

  test("contamination flags benchmark n-gram overlap, keeps zero-hit docs") {
    val benchmark = docs(
      100 -> "what is the capital of france and when was it founded exactly")
    val corpus = docs(
      1 -> "students often ask what is the capital of france and when was it founded exactly in exams", // contains the 8-gram
      2 -> "completely unrelated content about spark query engines and shuffles at scale today",
      3 -> "too short to shingle") // < 8 tokens: must still appear with 0 hits
    val r = Dedup.contamination(corpus, benchmark, "doc_id", "text", n = 8)
      .collect().map(r => r.getAs[Int]("doc_id") ->
        ((r.getAs[Long]("hits"), r.getAs[Boolean]("contaminated")))).toMap
    assert(r(1)._1 > 0 && r(1)._2)
    assert(r(2) == ((0L, false)))
    assert(r(3) == ((0L, false)))
    assert(r.size == 3)
  }

  test("substringPairs: w-token verbatim runs pair, shorter overlaps don't") {
    def words(prefix: String, n: Int) =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val run16 = words("shared", 16)   // exactly one 16-window
    val run17 = words("longer", 17)   // a 17-run = two 16-windows
    val run15 = words("short", 15)    // below w: must NOT pair
    val d = docs(
      1 -> s"${words("a", 10)} $run16 ${words("b", 10)}",
      2 -> s"${words("c", 10)} $run16 ${words("d", 10)}",
      3 -> s"${words("e", 10)} $run17 ${words("f", 10)}",
      4 -> s"${words("g", 10)} $run17 ${words("h", 10)}",
      5 -> s"${words("i", 10)} $run15 ${words("j", 10)}",
      6 -> s"${words("k", 10)} $run15 ${words("l", 10)}")
    val got = Dedup.substringPairs(d, "doc_id", "text", w = 16, maxDf = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((1, 2) -> 1L, (3, 4) -> 2L))
  }

  test("substringRuns: exact maximal run lengths via diagonal chaining") {
    def words(prefix: String, n: Int) =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val run16 = words("shared", 16)
    val run23 = words("long", 23) // one 23-token maximal run = 8 windows
    val d = docs(
      // pair (1,2): exactly one 16-run AND one 23-run, at DIFFERENT
      // offsets in each doc (different diagonals chain independently)
      1 -> s"${words("a", 5)} $run16 ${words("b", 9)} $run23",
      2 -> s"$run23 ${words("c", 12)} $run16",
      // pair (3,4): the same 23-run only
      3 -> s"${words("e", 7)} $run23",
      4 -> s"$run23 ${words("f", 7)}",
      // 5 shares nothing long enough
      5 -> s"${words("g", 40)}")
    val got = Dedup.substringRuns(d, "doc_id", "text", w = 16, maxDf = 64)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("max_run"), r.getAs[Long]("n_runs"))).toMap
    // run23 appears in docs 1,2,3,4 → df 4 ≤ 64, survives; the maximal
    // run is 23 tokens (8 chained windows), runs don't merge across
    // diagonals, and the 16-run reports exactly 16
    assert(got((1, 2)) == (23L, 2L), s"got ${got.get((1, 2))}")
    assert(got((3, 4)) == (23L, 1L))
    assert(got((1, 3))._1 == 23L)
    assert(!got.keySet.exists(p => p._1 == 5 || p._2 == 5))
  }

  test("substringPairs: boilerplate windows above maxDf are shed") {
    val boiler = (1 to 16).map(i => s"license$i").mkString(" ")
    // 4 docs all share the boilerplate run; maxDf=3 sheds it entirely
    val d = docs((1 to 4).map(i => i -> s"unique${i}a unique${i}b $boiler"): _*)
    assert(Dedup.substringPairs(d, "doc_id", "text", w = 16, maxDf = 3)
      .count() == 0)
    // at maxDf=4 the same corpus yields all 6 pairs
    assert(Dedup.substringPairs(d, "doc_id", "text", w = 16, maxDf = 4)
      .count() == 6)
  }

  test("cosinePairs finds identical and near-identical vectors only") {
    import spark.implicits._
    val vecs = Seq(
      (1, Array(1.0f, 0.0f, 0.0f)),
      (2, Array(0.9f, 0.1f, 0.0f)), // cos ~ 0.9939
      (3, Array(0.0f, 1.0f, 0.0f)), // orthogonal to 1
      (4, Array(1.0f, 0.0f, 0.0f))) // identical to 1
      .toDF("vec_id", "embedding")
    val p = Dedup.cosinePairs(vecs, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(p == Set((1, 2), (1, 4), (2, 4)))
  }
}
