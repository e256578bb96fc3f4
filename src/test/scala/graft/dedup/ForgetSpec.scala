package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Right-to-be-forgotten artifact patching ([[Forget]]): the contract is
  * incremental ≡ full — the patched artifact must be row-identical to a
  * full rebuild on the filtered corpus, including the hard case where
  * the deleted doc was the BRIDGE of a chain (the cluster must split)
  * and the pass-through case (clusters with no deleted member must not
  * be touched, let alone recomputed).
  */
class ForgetSpec extends AnyFunSuite with SparkSpec {

  /** A 3-doc near-dup CHAIN 1~2~3 (shifted token windows: adjacent
    * Jaccard ≈ 0.81 ≥ 0.8, ends ≈ 0.65 < 0.8) plus an unrelated exact
    * dup pair {100, 101} in a disjoint vocabulary.
    */
  private def chainCorpus: DataFrame = {
    import spark.implicits._
    def t(a: Int, b: Int) = (a to b).map(i => s"t$i").mkString(" ")
    def u(a: Int, b: Int) = (a to b).map(i => s"u$i").mkString(" ")
    Seq((1L, t(1, 40)), (2L, t(5, 44)), (3L, t(9, 48)),
      (100L, u(1, 40)), (101L, u(1, 40))).toDF("doc_id", "text")
  }

  private def exactPairsAmong(corpus: DataFrame)(ids: DataFrame): DataFrame =
    Dedup.jaccardPairs(corpus.join(ids, Seq("doc_id"), "left_semi"),
      "doc_id", "text")

  private def labelsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted chain: the pair relation is exactly 1~2 and 2~3 (spec precondition)") {
    val p = Dedup.jaccardPairs(chainCorpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == Set((1L, 2L), (2L, 3L), (100L, 101L)))
  }

  test("deleting the bridge doc SPLITS the chain cluster; untouched cluster passes through") {
    import spark.implicits._
    val corpus = chainCorpus
    val labels = Dedup.clusterLabels(corpus, "doc_id",
      Dedup.jaccardPairs(corpus, "doc_id", "text"))
    assert(labelsOf(labels) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (100L, 100L), (101L, 100L)))
    val deleted = Seq(2L).toDF("doc_id")
    val patched = Forget.forgetLabels(labels, deleted,
      exactPairsAmong(corpus))
    // 1 and 3 are not near-dups of each other: the cluster splits into
    // singletons; {100, 101} is untouched
    assert(labelsOf(patched) ==
      Set((1L, 1L), (3L, 3L), (100L, 100L), (101L, 100L)))
  }

  test("deleting the cluster MINIMUM re-elects the representative label") {
    import spark.implicits._
    val corpus = chainCorpus
    val labels = Dedup.clusterLabels(corpus, "doc_id",
      Dedup.jaccardPairs(corpus, "doc_id", "text"))
    val patched = Forget.forgetLabels(labels, Seq(100L).toDF("doc_id"),
      exactPairsAmong(corpus))
    // 101 was labeled by the deleted min id 100 — it must relabel to
    // itself; the chain cluster is untouched
    assert(labelsOf(patched) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (101L, 101L)))
  }

  test("forgetLabels ≡ full rebuild on the filtered corpus (sf0.001 differential)") {
    val spark0 = spark
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark0, dir, "documents")
    val deleted = docs.filter(col("doc_id") % 29 === 3).select("doc_id")
    val labels = Dedup.duplicateClusters(docs, "doc_id", "text")
    // non-vacuity: the deletion batch must hit at least one MULTI-doc
    // cluster, or the repair path was never exercised
    val affected = labels.join(deleted, "doc_id").select("cluster_id")
    val affectedSizes = labels
      .join(affected.distinct(), "cluster_id").groupBy("cluster_id").count()
    assert(affectedSizes.filter(col("count") > 1).count() > 0)
    val patched = Forget.forgetLabels(labels, deleted,
      ids => Dedup.minhashLshPairs(
        docs.join(ids, Seq("doc_id"), "left_semi"), "doc_id", "text"))
    val survivors = docs.join(deleted, Seq("doc_id"), "left_anti")
    val rebuilt = Dedup.duplicateClusters(survivors, "doc_id", "text")
    assert(labelsOf(patched) == labelsOf(rebuilt))
    // and at least one surviving doc actually changed label (a deleted
    // minimum forced a re-election) — the repair is not an identity map
    val changed = patched.as("p")
      .join(labels.as("l"), Seq("doc_id"))
      .filter(col("p.cluster_id") =!= col("l.cluster_id"))
    assert(changed.count() > 0)
  }

  test("forgetLabels is modality-generic: embedding clusters patch ≡ rebuild (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables(spark, dir, "embeddings")
    def pairsOf(df: DataFrame) =
      Dedup.cosinePairsBlocked(df, "vec_id", "embedding", threshold = 0.4)
        .select(col("a_id"), col("b_id"))
    val labels = Dedup.clusterLabels(emb, "vec_id", pairsOf(emb))
    val deleted = emb.filter(col("vec_id") % 17 === 2)
      .select(col("vec_id").as("doc_id"))
    // non-vacuity: the deletion must hit a multi-vector cluster
    val affected = labels.join(deleted, "doc_id").select("cluster_id").distinct()
    assert(labels.join(affected, "cluster_id")
      .groupBy("cluster_id").count().filter(col("count") > 1).count() > 0)
    val patched = Forget.forgetLabels(labels, deleted,
      ids => pairsOf(emb.join(ids.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")))
    val survivors = emb.join(deleted.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_anti")
    val rebuilt = Dedup.clusterLabels(survivors, "vec_id", pairsOf(survivors))
    assert(labelsOf(patched) == labelsOf(rebuilt))
  }

  test("forgetIndex: patched-index incremental dedup ≡ fresh-index build (sf0.001)") {
    val spark0 = spark
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark0, dir, "documents")
    val deleted = docs.filter(col("doc_id") % 29 === 3).select("doc_id")
    val forgotten = docs.join(deleted, Seq("doc_id"), "left_anti")
    val batch = forgotten.filter(col("doc_id") % 7 === 0)
    val corpus = forgotten.filter(col("doc_id") % 7 =!= 0)
    val patched = Forget.forgetIndex(
      Dedup.minhashIndex(docs.filter(col("doc_id") % 7 =!= 0),
        "doc_id", "text"),
      deleted)
    val fresh = Dedup.minhashIndex(corpus, "doc_id", "text")
    // the patched index is row-identical to one built on the filtered
    // corpus — that is what makes the anti-join a sufficient patch
    assert(patched.except(fresh).isEmpty && fresh.except(patched).isEmpty)
    def pairs(index: DataFrame) =
      Dedup.incrementalNearDup(batch, corpus, index, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPatched = pairs(patched)
    assert(viaPatched == pairs(fresh))
    assert(viaPatched.nonEmpty)
    // no deleted id can resurface as a dedup witness
    val del = deleted.collect().map(_.getLong(0)).toSet
    assert(!viaPatched.exists { case (a, b) => del(a) || del(b) })
  }

  test("forgetIndex on the cosine bucket index: patch ≡ rebuild on the " +
      "filtered vectors; untouched rows pass through identically (sf0.001)") {
    val spark0 = spark
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables(spark0, dir, "embeddings")
      .select(col("vec_id"), org.apache.spark.sql.functions.transform(
        col("embedding"), _.cast("double")).as("embedding"))
    val deleted = emb.filter(col("vec_id") % 17 === 2)
      .select(col("vec_id").as("doc_id"))
    val kept = emb.join(deleted.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_anti")
    def index(of: DataFrame) = Dedup.cosineBucketIndex(of, "vec_id",
      "embedding", tables = 24, bitsPerTable = 16)
    val patched = Forget.forgetIndex(index(emb), deleted)
    val fresh = index(kept)
    // row-identical: index rows depend only on their own vector, so the
    // anti-join patch IS the rebuild (same buckets, same tables)
    assert(patched.except(fresh).isEmpty && fresh.except(patched).isEmpty)
    // untouched vectors' rows survive the patch byte-for-byte: the
    // patched index restricted to surviving ids equals the original's
    val origSurviving = index(emb).join(
      deleted.select(col("doc_id").as("doc")), Seq("doc"), "left_anti")
    assert(patched.except(origSurviving).isEmpty &&
      origSurviving.except(patched).isEmpty)
    // the deletion batch is non-vacuous and no deleted id remains
    val del = deleted.collect().map(_.getLong(0)).toSet
    assert(del.nonEmpty)
    assert(patched.filter(col("doc").isInCollection(del)).isEmpty)
    // r15 (adaptive-width index): the PERSISTED artifact now carries a
    // sizing meta file inside its parquet dir — the patch path must be
    // unaffected by it (file invisible to the reader) and the meta must
    // survive the patch-in-place flow the forget queries use
    val root = java.nio.file.Files.createTempDirectory("forget_cosidx").toString
    val written = Dedup.writeCosineIndex(emb, "vec_id", "embedding",
      s"$root/index")
    assert(written.bits == 16) // testdata sits under the floor
    val readBack = spark0.read.parquet(s"$root/index")
    val patchedPersisted = Forget.forgetIndex(readBack, deleted)
    val freshAtMeta = Dedup.cosineBucketIndex(kept, "vec_id", "embedding",
      tables = written.tables, bitsPerTable = written.bits)
    assert(patchedPersisted.except(freshAtMeta).isEmpty &&
      freshAtMeta.except(patchedPersisted).isEmpty)
    assert(Dedup.readCosineIndexMeta(spark0, s"$root/index")
      .contains(written))
  }
}
