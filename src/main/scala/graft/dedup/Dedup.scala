package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for large-scale corpora: exact (hash-groupBy),
  * exact n-gram Jaccard (shingle inverted index), MinHash+LSH (banded
  * signature buckets + exact verification), and SimHash (bit-sampled
  * fingerprints + pigeonhole chunk buckets).
  *
  * Scale design: nothing here compares all N² document pairs. Candidate
  * generation always goes through a shuffle ON A CONTENT KEY (shingle,
  * LSH band bucket, SimHash chunk) so co-occurring documents meet in the
  * same partition; the only pairwise work is within buckets, whose size
  * the banding parameters control. This is the shape that survives a
  * 1000-executor / 100 TB corpus; the driver never sees the data.
  */
object Dedup {

  /** Exact duplicate grouping on an 8-byte normalized-content hash:
    * every document maps to the canonical (minimum) id of its content
    * group. One map-side-combinable shuffle on the hash key. Collision
    * note: at corpus scale a 61-bit hash will collide; production pairs
    * it with a second independent hash (here: bag hash) making false
    * merges vanishingly rare without comparing bodies.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val key = TextOps.rollingHash(TextOps.normalize(col(textCol)))
    df.select(col(idCol).as("doc"), key.as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(
        min(col("doc")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
  }

  /** Exact n-gram Jaccard similarity ≥ `threshold` with prefix
    * filtering (SSJoin/PPJoin): each doc's shingles are ordered by
    * global rarity and only the first |d| − ⌈t·|d|⌉ + 1 ("prefix")
    * participate in the inverted-index self-join — any pair with
    * J ≥ t MUST share a prefix shingle (J ≥ t ⟹ |A∩B| ≥ t·|A|, and two
    * sets whose rarity-ordered prefixes are disjoint cannot overlap
    * that much), so candidates are pruned without losing a single true
    * pair; the exact Jaccard then verifies each candidate. A plain
    * full-index self-join produced ~80M intermediate pairs at sf0.1;
    * the prefix index cuts that by ~t/(1−t)² while returning the
    * identical relation (the DuckDB oracle checks this).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
      explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("sh"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    // global rarity order: document-frequency per shingle
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("dfr"))
    val byRarity = Window.partitionBy(col("doc")).orderBy(col("dfr"), col("sh"))
    // ceil(t*n) with an epsilon so fp rounding can only ENLARGE the
    // prefix (a too-small prefix would silently drop true pairs)
    val prefixLen = col("n_sh") -
      ceil(col("n_sh") * lit(threshold) - lit(1e-9)) + 1
    val prefix = sh.join(dfreq, "sh")
      .withColumn("rn", row_number().over(byRarity))
      .join(sizes, "doc")
      .filter(col("rn") <= prefixLen)
      .select(col("doc"), col("sh"))
    val candidates = prefix.as("x").join(prefix.as("y"), "sh")
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a_id"), col("y.doc").as("b_id"))
      .distinct()
    verifyExactJaccard(candidates, sh, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against the exploded
    * (doc, shingle) relation — the single definition both candidate
    * generators ([[jaccardPairs]], [[minhashLshPairs]]) must share so
    * their outputs stay provably identical.
    */
  private def verifyExactJaccard(candidates: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val shSets = sh.groupBy(col("doc")).agg(collect_list(col("sh")).as("shs"))
    candidates
      .join(shSets.select(col("doc").as("a_id"), col("shs").as("sh_a")), "a_id")
      .join(shSets.select(col("doc").as("b_id"), col("shs").as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures + banded LSH candidate generation + exact
    * verification. `nHashes` minhash values per doc (xxhash64 seeded by
    * position), `nBands` bands of `nHashes/nBands` rows hashed to a
    * bucket; docs sharing any band bucket become candidates, and
    * candidates are verified with the EXACT Jaccard so the output equals
    * [[jaccardPairs]] up to LSH recall (≥ 1 − (1−t^r)^b, ≈ 1 − 5e-8 at
    * t=0.8 with 32 bands × 4 rows).
    *
    * At 100 TB this is the dedup workhorse: signatures are one narrow
    * pass, candidate generation shuffles (band, bucket) keys only, and
    * the pairwise verify touches candidate pairs, not N².
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      nHashes: Int = 128, nBands: Int = 32): DataFrame = {
    require(nHashes % nBands == 0, "nBands must divide nHashes")
    val rowsPerBand = nHashes / nBands
    // (doc, shingle) inverted rows. The Generate (explode) node is a real
    // plan barrier: the tokenize+shingle expression runs ONCE per doc.
    // Computing signatures as nested HOFs instead would let Catalyst's
    // CollapseProject inline that expression into every one of the 128
    // hash lambdas — measured 50x slower at sf0.1.
    val sh = df.select(col(idCol).as("doc"),
      explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("sh"))
    // 128 min-aggregates over xxhash64(seed_i, shingle): one map-side-
    // combinable shuffle on doc, whole-stage codegen throughout.
    val sigCols = (0 until nHashes).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    val sig = sh.groupBy(col("doc"))
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc"),
        array((0 until nHashes).map(i => col(s"h$i")): _*).as("sig"))
    val bands = sig.select(col("doc"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("doc", "band", "bucket")
    val candidates = bands.as("x").join(bands.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a_id"), col("y.doc").as("b_id"))
      .distinct()
    verifyExactJaccard(candidates, sh, threshold)
  }

  /** 64-bit SimHash over the token multiset (term-frequency weighted):
    * bit j is the sign of Σ_tokens (±1 by bit j of xxhash64(token)).
    */
  def simhash(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(sequence(lit(0), lit(63)), j => {
        // scala functions.shiftright only takes a literal Int shift —
        // call the SQL function to shift by the lambda variable
        val vote = aggregate(toks, lit(0L), (acc, t) =>
          acc + when(call_function("shiftright", xxhash64(t), j)
            .bitwiseAND(1) === 1, 1L).otherwise(-1L))
        when(vote >= 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
      }),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** Near-duplicate pairs by SimHash Hamming distance ≤ `maxHamming`
    * (< 64/16 = 4, so the 4×16-bit chunk pigeonhole is exact: any pair
    * within distance 3 shares at least one identical chunk). Candidates
    * come from a self-join on (chunk index, chunk value) — a content-key
    * shuffle, never N² — and are verified with bit_count(xor).
    */
  /** Distributed simhash: explode tokens (one tokenize per doc, plan
    * barrier as in [[minhashLshPairs]]), 64 vote-sum aggregates over the
    * token hash bits, pack the sign bits. Bit-identical to [[simhash]]
    * for non-empty token lists, but whole-stage-codegen'd and map-side
    * combinable.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      explode(TextOps.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val voteCols = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"v$j"))
    toks.groupBy(col("doc"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc"),
        (0 until 64).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh64"))
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4x16-bit chunking is only exact for hamming <= 3")
    val hashed = simhash64(df, idCol, textCol)
    val chunks = hashed.select(col("doc"), col("sh64"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sh64"), c * 16).bitwiseAND(0xFFFFL))))
      .toDF("doc", "sh64", "chunk", "val")
    chunks.as("x").join(chunks.as("y"), Seq("chunk", "val"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a_id"), col("y.doc").as("b_id"),
        bit_count(col("x.sh64").bitwiseXOR(col("y.sh64"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Duplicate CLUSTERS: connected components over the near-dup pair
    * graph, labeling every document with the minimum doc id of its
    * component (singletons label themselves). Pairs say "these two match";
    * clusters are what dedup actually acts on — keep one representative
    * per cluster.
    *
    * Distributed label propagation: each iteration every node takes the
    * min of its own and its neighbors' labels; converges in
    * O(component diameter) rounds (near-dup components are tiny — chains
    * longer than a few hops are rare), checked with a driver-side
    * changed-count so the loop stops exactly at the fixpoint. Each round
    * is one join + one aggregate, shuffling on node id — the standard
    * scale shape for connected components without a graph engine.
    */
  def duplicateClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxIters: Int = 20): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, n, threshold)
      .select(col("a_id"), col("b_id"))
    val edges = pairs
      .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .toDF("src", "dst")
      .localCheckpoint()
    var labels = df.select(col(idCol).as("doc"), col(idCol).as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbMin = edges
        .join(labels.select(col("doc").as("src"), col("label").as("nl")), "src")
        .groupBy(col("dst").as("doc"))
        .agg(min(col("nl")).as("nbl"))
      val next = labels.join(nbMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("label"), coalesce(col("nbl"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), "doc")
        .filter(col("label") =!= col("old")).count()
      // the superseded round's blocks are no longer referenced — release
      // them, or long chains pin O(iterations) copies of the label table
      org.apache.spark.sql.graft.CheckpointUtils.release(labels)
      labels = next
      iter += 1
    }
    // pin only the (tiny) result; release the loop's working state so a
    // long-lived session doesn't accumulate label-table copies
    val result = labels
      .select(col("doc").as("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint()
    org.apache.spark.sql.graft.CheckpointUtils.release(labels)
    org.apache.spark.sql.graft.CheckpointUtils.release(edges)
    result
  }

  /** Exact cosine near-duplicate pairs over an embedding column, cosine
    * ≥ `threshold`. All-pairs — correct at verification scale; the
    * bucketed scale path is [[graft.ann.Ann.lshNeighbors]], which
    * replaces the cross join with sign-LSH bucket joins.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.ArrayDotProduct.ofColumns
    val v = transform(col(vecCol), x => x.cast("double"))
    val prepped = df.select(col(idCol).as("doc"), v.as("v"))
      .withColumn("norm", sqrt(ofColumns(col("v"), col("v"))))
    val a = prepped.select(col("doc").as("a_id"), col("v").as("va"), col("norm").as("na"))
    val b = prepped.select(col("doc").as("b_id"), col("v").as("vb"), col("norm").as("nb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("dot", ofColumns(col("va"), col("vb")))
      .withColumn("cosine", col("dot") / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))
  }
}
