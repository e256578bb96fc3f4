package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** The dataset card must agree with the stages it summarizes — every
  * number re-derived here from the independently-tested operators.
  */
class CardSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val card: Map[String, Double] =
    CardQ.dataCard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("card carries exactly the 16 metrics, all finite") {
    assert(card.size === 16)
    card.values.foreach(v => assert(!v.isNaN && !v.isInfinite))
  }

  test("media undecodable rates equal the planted quarantine densities") {
    val docs = graft.Tables(spark, dir, "documents")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    def planted(p: Long => Boolean) = ids.count(p).toDouble / ids.length
    assert(card("media.image_undecodable_rate") ===
      planted(id => id % 91 == 0 || id % 97 == 0))
    assert(card("media.jpeg_undecodable_rate") === planted(_ % 91 == 0))
    assert(card("media.audio_undecodable_rate") === planted(_ % 89 == 0))
    assert(card("media.video_undecodable_rate") === planted(_ % 83 == 0))
    // non-vacuous: corruption is actually planted at this sf
    assert(card("media.image_undecodable_rate") > 0.0)
  }

  test("volume and split metrics re-derive from the corpus") {
    val docs = graft.Tables(spark, dir, "documents")
    val n = docs.count()
    assert(card("volume.n_docs") === n.toDouble)
    assert(card("volume.n_sources") === 20.0)
    val nTokens = docs
      .agg(sum(size(graft.text.TextOps.tokens(col("text"))).cast("long")))
      .head().getLong(0)
    assert(card("volume.n_tokens") === nTokens.toDouble)
    // split fractions sum to 1 and sit near the 90/5/5 design
    val fr = Seq("train", "val", "test").map(s => card(s"split.${s}_frac"))
    assert(math.abs(fr.sum - 1.0) < 1e-9)
    assert(fr(0) > 0.8 && fr(1) < 0.15 && fr(2) < 0.15)
  }

  test("dedup metrics agree with the cluster operator") {
    val cl = DedupQ.dedupClusters(spark, dir)
    val n = cl.count()
    val nClusters = cl.select("cluster_id").distinct().count()
    assert(card("dedup.n_clusters") === nClusters.toDouble)
    val canon = cl.filter(col("doc_id") === col("cluster_id")).count()
    assert(math.abs(card("dedup.canonical_rate") - canon.toDouble / n) < 1e-6)
    // planted dups make the rate strictly below 1
    assert(card("dedup.canonical_rate") < 1.0)
  }

  test("cardinality estimate tracks the exact distinct shingle count") {
    val exact = graft.Tables(spark, dir, "documents")
      .select(graft.text.TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 8)
      .select(explode(graft.text.TextOps.shingles(col("toks"), 8)).as("g"))
      .select(graft.functions.RollingHash.ofColumn(col("g")).as("h"))
      .distinct().count()
    val est = card("sketch.shingle_ndv_est")
    assert(math.abs(est - exact) / exact < 0.15, s"est $est vs exact $exact")
  }

  test("quality and contamination rates are in-range and non-vacuous") {
    assert(card("quality.avg_quality") > 0.3 && card("quality.avg_quality") < 1.0)
    assert(card("quality.keep_rate") > 0.0 && card("quality.keep_rate") <= 1.0)
    val c = card("decontam.contaminated_rate")
    assert(c >= 0.0 && c < 0.5)
  }
}
