package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** The stage-artifact curation contract: composing the corpus verdict
  * from the PERSISTED cluster-label artifact must reproduce the inline
  * composition exactly — otherwise a staged 100 TB run and the oracled
  * single-plan form could silently diverge.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("crossSourceDups: handcrafted clusters pin the matrix math") {
    import spark.implicits._
    // cluster 1: {a, a, b} -> (a,b) shares 1 cluster, 2*1 cross pairs
    // cluster 2: {a, b, c} -> (a,b)+1 cluster/pair, (a,c) and (b,c) 1 each
    // cluster 3: {a, a}    -> same-source only: NOT in the matrix
    // cluster 4: {c}       -> singleton: no pairs
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "b"),
      (4L, "a"), (5L, "b"), (6L, "c"),
      (7L, "a"), (8L, "a"),
      (9L, "c")).toDF("doc_id", "source")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L),
      (7L, 7L), (8L, 7L),
      (9L, 9L)).toDF("doc_id", "cluster_id")
    val got = DedupQ.crossSourceDupsFrom(docs, clusters).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 3L)), // clusters 1+2; pairs 2·1 + 1·1
      ("a", "c") -> ((1L, 1L)),
      ("b", "c") -> ((1L, 1L))))
  }

  test("crossSourceDupsCompose (prebuilt artifact) == crossSourceDups (inline)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val inline = rows(DedupQ.crossSourceDups(spark, dir))
    // non-vacuous: the planted near-dups must actually cross sources
    assert(inline.nonEmpty)
    assert(rows(DedupQ.crossSourceDupsCompose(spark, dir)) == inline)
  }

  test("corpusFilterStaged (parquet artifact) == corpusFilter (inline)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSet
    val inline = rows(DedupQ.corpusFilter(spark, dir))
    val staged = rows(DedupQ.corpusFilterStaged(spark, dir))
    assert(inline.nonEmpty)
    assert(staged == inline)
    // compose-only (prebuilt artifact) must be the same relation too —
    // the separately-benched serving half of the staged shape
    val composed = rows(DedupQ.corpusFilterCompose(spark, dir))
    assert(composed == inline)
  }

  test("semDedup keeps exactly the best-quality doc per cluster") {
    val rows = DedupQ.semDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 500)
    val byCluster = rows.groupBy(_._2)
    // one representative per cluster, and it's the (quality desc, id)
    // argmax of its cluster
    for ((_, members) <- byCluster) {
      val kept = members.filter(_._4)
      assert(kept.length == 1)
      assert(kept.head == members.minBy(m => (-m._3, m._1)))
    }
    // the operator must do real work on this corpus: at least one
    // multi-member cluster, so at least one doc is dropped
    assert(rows.count(!_._4) > 0)
    assert(byCluster.exists(_._2.length > 1))
  }

  test("leakage-safe split: every near-dup cluster moves as one") {
    val rows = DedupQ.splitLeakageSafe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == 500)
    // cluster coherence: one split per cluster — the leakage guarantee
    for ((_, members) <- rows.groupBy(_._2))
      assert(members.map(_._4).distinct.length == 1)
    // singletons reduce exactly to the doc-level rule (T10)
    val docLevel = TextQ.splitAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    for ((id, cid, _, split) <- rows if id == cid)
      assert(split == docLevel(id), s"representative $id")
    // and the guarantee is non-vacuous: some multi-member cluster exists
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
  }

  test("corpusFilterMm: image + audio + video canonicality conjoined, non-vacuously") {
    def collectMm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("image_ok"), r.getAs[Boolean]("audio_ok"),
          r.getAs[Boolean]("video_ok"), r.getAs[Boolean]("keep"))).toMap
    val mm = collectMm(DedupQ.corpusFilterMm(spark, dir))
    val txt = DedupQ.corpusFilter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(mm.keySet == txt.keySet)
    // keep is EXACTLY the text verdict AND the three modality bits
    for ((id, (imgOk, audOk, vidOk, keep)) <- mm)
      assert(keep == (txt(id) && imgOk && audOk && vidOk), s"doc $id")
    // quarantined assets (undecodable PNGs / truncated WAVs / truncated
    // MP4s) must fail their modality bit
    for (id <- mm.keys if id % 91 == 0 || id % 97 == 0)
      assert(!mm(id)._1, s"quarantined doc $id has image_ok")
    for (id <- mm.keys if id % 89 == 0)
      assert(!mm(id)._2, s"quarantined doc $id has audio_ok")
    for (id <- mm.keys if id % 83 == 0)
      assert(!mm(id)._3, s"quarantined doc $id has video_ok")
    // the media terms flip at least one otherwise-kept verdict
    assert(mm.exists { case (id, (_, _, _, keep)) => txt(id) && !keep })
    // ... and the VIDEO term specifically is non-vacuous: some doc
    // passes text+image+audio yet fails on video alone (the planted
    // video dups/corruption must do real work in the conjunction)
    assert(mm.exists { case (id, (imgOk, audOk, vidOk, _)) =>
      txt(id) && imgOk && audOk && !vidOk })
    // and do not kill everything: some doc survives the full verdict
    assert(mm.exists(_._2._4))
    // the composed form (all four cluster stages read from parquet
    // artifacts) is row-identical to the inline form
    assert(collectMm(DedupQ.corpusFilterMmCompose(spark, dir)) == mm)
  }

  test("corpusReportMmCompose (prebuilt artifacts) == corpusReportMm (inline)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSet
    val inline = rows(DedupQ.corpusReportMm(spark, dir))
    assert(inline.nonEmpty)
    assert(rows(DedupQ.corpusReportMmCompose(spark, dir)) == inline)
  }

  test("verdictDiff: arrival batch surfaces as added; structure invariants hold") {
    import org.apache.spark.sql.functions._
    val diff = DedupQ.verdictDiff(spark, dir).collect()
    assert(diff.nonEmpty)
    val added = diff.filter(_.getString(1) == "added")
    // every added doc is in the arrival batch and in the verdict
    // universe (the % 10 == 0 benchmark slice has no verdict row)
    added.foreach { r =>
      assert(r.getLong(0) % 13 === 5L)
      assert(r.getLong(0) % 10 != 0L)
      assert(r.getString(2) === "absent")
      assert(r.getString(4) === "absent")
    }
    // the added set is COMPLETE: exactly the batch ∩ universe
    val expectAdded = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 13 === 5 && col("doc_id") % 10 =!= 0)
      .count()
    assert(added.length.toLong === expectAdded)
    // old ⊂ new, so removal is impossible; every status is one of the
    // three transitions; flipped rows carry real boolean strings
    diff.foreach { r =>
      assert(Set("added", "keep_flipped", "canonical_moved")(r.getString(1)))
      assert(Set("true", "false")(r.getString(3)))
      if (r.getString(1) != "added") {
        assert(Set("true", "false")(r.getString(2)))
        assert(r.getLong(0) % 13 != 5L, "a flip must be an OLD doc")
      }
    }
    // the non-local flip itself (new near-dups demoting old docs) is
    // exercised by the sf0.01 correctness gate every round: this corpus
    // (sf0.001) is too sparse for the batch to collide with a cluster
  }
}
