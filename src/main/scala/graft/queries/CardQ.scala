package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The DATASET CARD — the one-page corpus-level summary a training-data
  * release ships with (volume, quality, duplication, contamination,
  * split balance, per-modality media health, content cardinality), as a
  * single oracled artifact:
  * every number on the card is computed by an independently-oracled
  * stage of this engine and replayed by the card's own DuckDB oracle,
  * so the published card can never drift from the pipeline that
  * produced it.
  *
  * Output is a tidy (metric, value) relation — 16 rows, all DOUBLE
  * (counts are exact integers in double range; rates are single IEEE
  * divisions of exact counts; the quality average divides the exact
  * DECIMAL(10,7) sum — the corpus-report discipline).
  *
  * Scale shape: one narrow tokenize pass feeds the volume/quality/split
  * rows; duplication reuses the T6 cluster machinery (at 100 TB: the
  * persisted cluster artifact); contamination is the D8 gate;
  * cardinality is ONE corpus-level KMV sketch (O(k) state, map-side
  * combined); the media rows read the persisted per-modality cluster
  * artifacts (no codec pass). Everything aggregates to one row per
  * metric — the card itself is bytes.
  */
object CardQ {

  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")

    def one(metric: String, df: DataFrame): DataFrame =
      df.select(lit(metric).as("metric"), col("v").cast("double").as("value"))

    def rate(num: Column, den: Column): Column =
      (num.cast("double") / den.cast("double")).as("v")

    val toks = graft.text.TextOps.tokens(col("text"))
    val vol = Seq(
      one("volume.n_docs", docs.agg(count(lit(1)).as("v"))),
      one("volume.n_tokens", docs.agg(sum(size(toks).cast("long")).as("v"))),
      one("volume.n_sources", docs.agg(countDistinct(col("source")).as("v"))))

    val q = TextQ.qualityScore(spark, dir)
      .select(col("quality").cast(DecimalType(10, 7)).as("qd"), col("keep"))
    val qual = Seq(
      one("quality.avg_quality",
        q.agg(rate(sum(col("qd")), count(lit(1))))),
      one("quality.keep_rate",
        q.agg(rate(sum(col("keep").cast("long")), count(lit(1))))))

    // the cluster artifact, not an inline clustering pass — the card is
    // a summary, it must not re-pay the most expensive stage (built
    // once per JVM; at 100 TB it is simply the current version's
    // persisted labels)
    val cl = DedupQ.textClustersFromArtifact(spark, dir)
    val ded = Seq(
      one("dedup.n_clusters", cl.agg(countDistinct(col("cluster_id")).as("v"))),
      one("dedup.canonical_rate",
        cl.agg(rate(sum((col("doc_id") === col("cluster_id")).cast("long")),
          count(lit(1))))))

    val decon = graft.dedup.Dedup.contamination(
      corpus = docs.filter(col("doc_id") % 10 =!= 0),
      benchmark = docs.filter(col("doc_id") % 10 === 0),
      idCol = "doc_id", textCol = "text", n = 8)
    val dec = Seq(one("decontam.contaminated_rate",
      decon.agg(rate(sum(col("contaminated").cast("long")), count(lit(1))))))

    val sp = TextQ.splitAssign(spark, dir)
    val spl = Seq("train", "val", "test").map(s =>
      one(s"split.${s}_frac",
        sp.agg(rate(sum((col("split") === s).cast("long")), count(lit(1))))))

    // per-modality undecodable rates from the persisted cluster-label
    // artifacts (a decodable asset always has a label row, singletons
    // included — the mm-report convention; absence = quarantined), so
    // the card never re-pays a codec pass
    def mediaRow(name: String, labels: DataFrame): DataFrame = {
      val flagged = docs.select(col("doc_id"))
        .join(labels.select(col("doc_id"), lit(1).as("dec")),
          Seq("doc_id"), "left")
      one(s"media.${name}_undecodable_rate",
        flagged.agg(rate(
          sum(when(col("dec").isNull, 1L).otherwise(0L)), count(lit(1)))))
    }
    val media = Seq(
      mediaRow("image", DedupQ.imageClustersFromArtifact(spark, dir)),
      mediaRow("jpeg", DedupQ.jpegClustersFromArtifact(spark, dir)),
      mediaRow("audio", DedupQ.audioClustersFromArtifact(spark, dir)),
      mediaRow("video", DedupQ.videoClustersFromArtifact(spark, dir)))

    // corpus-level distinct-shingle cardinality from ONE global KMV
    // sketch (the K1c estimator without the per-source key)
    val kh = docs
      .select(graft.text.TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 8)
      .select(explode(graft.text.TextOps.shingles(col("toks"), 8)).as("g"))
      .select(graft.functions.RollingHash.ofColumn(col("g")).as("h"))
    val ndv = Seq(one("sketch.shingle_ndv_est",
      kh.agg(graft.functions.Kmv.sketchOf(col("h"), 256).as("sk"))
        .select(graft.functions.Kmv.estimate(col("sk"), 256).as("v"))))

    (vol ++ qual ++ ded ++ dec ++ spl ++ media ++ ndv).reduce(_ unionByName _)
      .select(col("metric"), round(col("value"), 6).as("value"))
      .orderBy(col("metric"))
  }

  /** The card SERVED the way a release actually ships it: published as
    * a versioned artifact next to the cluster labels it summarizes
    * (one [[graft.ops.Publish.publish]] call, one manifest pointer —
    * the card can never describe a different corpus version than the
    * labels beside it) and read back through `Publish.current`. Shares
    * [[dataCard]]'s oracle verbatim: identical rows through the
    * pointer IS the contract under test.
    */
  def dataCardPublished(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(DedupQ.publishedStore(spark, dir)("card"))
      .orderBy(col("metric"))
}
