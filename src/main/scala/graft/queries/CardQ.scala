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

  private def one(metric: String, df: DataFrame): DataFrame =
    df.select(lit(metric).as("metric"), col("v").cast("double").as("value"))

  private def rate(num: Column, den: Column): Column =
    (num.cast("double") / den.cast("double")).as("v")

  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")

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

    // corpus-level distinct-shingle cardinality from ONE global KMV
    // sketch (the K1c estimator without the per-source key)
    val ndv = Seq(one("sketch.shingle_ndv_est",
      shingleHashes(docs)
        .agg(graft.functions.Kmv.sketchOf(col("h"), 256).as("sk"))
        .select(graft.functions.Kmv.estimate(col("sk"), 256).as("v"))))

    (vol ++ qual ++ artifactRows(spark, dir, docs) ++ dec ++ spl ++ ndv)
      .reduce(_ unionByName _)
      .select(col("metric"), round(col("value"), 6).as("value"))
      .orderBy(col("metric"))
  }

  /** The card rows served from PERSISTED cluster-label artifacts (the
    * card is a summary — it must not re-pay the clustering or a codec
    * pass): duplication and the per-modality media-health rates. Shared
    * by the full and the incremental card (these artifacts are already
    * the incrementally-maintained state — D16/D18 patch them).
    */
  private def artifactRows(spark: SparkSession, dir: String,
      docs: DataFrame): Seq[DataFrame] = {
    // the cluster artifacts, not inline clustering passes (built once
    // per JVM; at 100 TB they are simply the current version's
    // labels). The five first-touch builds are independent — overlap
    // them (r18, [[graft.ops.Overlap]]); later calls are pure reads.
    val Seq(cl, img, jpg, aud, vid) = graft.ops.Overlap.all(
      () => DedupQ.textClustersFromArtifact(spark, dir),
      () => DedupQ.imageClustersFromArtifact(spark, dir),
      () => DedupQ.jpegClustersFromArtifact(spark, dir),
      () => DedupQ.audioClustersFromArtifact(spark, dir),
      () => DedupQ.videoClustersFromArtifact(spark, dir))
    val ded = Seq(
      one("dedup.n_clusters", cl.agg(countDistinct(col("cluster_id")).as("v"))),
      one("dedup.canonical_rate",
        cl.agg(rate(sum((col("doc_id") === col("cluster_id")).cast("long")),
          count(lit(1))))))
    // per-modality undecodable rates: a decodable asset always has a
    // label row, singletons included (the mm-report convention;
    // absence = quarantined)
    def mediaRow(name: String, labels: DataFrame): DataFrame = {
      val flagged = docs.select(col("doc_id"))
        .join(labels.select(col("doc_id"), lit(1).as("dec")),
          Seq("doc_id"), "left")
      one(s"media.${name}_undecodable_rate",
        flagged.agg(rate(
          sum(when(col("dec").isNull, 1L).otherwise(0L)), count(lit(1)))))
    }
    ded ++ Seq(
      mediaRow("image", img),
      mediaRow("jpeg", jpg),
      mediaRow("audio", aud),
      mediaRow("video", vid))
  }

  private def shingleHashes(docs: DataFrame): DataFrame =
    docs
      .select(graft.text.TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 8)
      .select(explode(graft.text.TextOps.shingles(col("toks"), 8)).as("g"))
      .select(graft.functions.RollingHash.ofColumn(col("g")).as("h"))

  /** q_data_card_incremental: the card maintained from PARTIAL
    * AGGREGATION STATE — the q_incremental_mart recipe applied to the
    * release summary. The corpus splits into an established batch
    * (doc_id % 7 != 0) and an arriving batch (doc_id % 7 == 0); each
    * batch persists ONE tiny state row (sums, a distinct-source set,
    * the exact DECIMAL quality sum, per-split counts, a KMV bottom-k
    * array — every component chosen mergeable: sums add, sets union,
    * bottom-k of a union of bottom-ks is the union's bottom-k), and
    * the card finalizes by MERGING states, never rescanning a batch.
    * The artifact-served rows (duplication, media health) read the same
    * persisted labels as the full card — those artifacts are already
    * the incrementally-maintained state (the forget/ingest operators
    * patch them).
    *
    * Incremental ≡ full is the gate: shares q_data_card's oracle
    * VERBATIM — the merged card must reproduce the one-pass card to
    * the last rounded digit (exact-integer sums, exact DECIMAL quality,
    * order-insensitive KMV), which is precisely why the state carries
    * decimals and sketches rather than pre-divided rates.
    *
    * Scale: per ingest batch the state row is O(k + sources) bytes;
    * refreshing the card costs a state-sized merge — the 100 TB shape
    * where a daily card never re-reads the corpus.
    */
  def dataCardIncremental(spark: SparkSession, dir: String): DataFrame = {
    val state = graft.ops.StageArtifacts.ensure(dir, "card-state") { out =>
      Seq("a" -> (col("doc_id") % 7 =!= 0), "b" -> (col("doc_id") % 7 === 0))
        .foreach { case (tag, pred) =>
          cardPartialState(spark, dir, pred)
            .write.mode("overwrite").parquet(s"$out/$tag")
        }
    }
    val states = spark.read.parquet(s"$state/a")
      .unionByName(spark.read.parquet(s"$state/b"))
    dataCardFromStates(spark, dir, states)
  }

  /** One batch's partial-state row. `pred` is a doc_id predicate —
    * every per-doc metric (quality, split, contamination flag) is a
    * function of the doc alone (contamination: of the doc and the
    * FIXED benchmark slice), so restricting the per-doc relations to
    * the batch and aggregating is exactly the map side of the card's
    * aggregation tree.
    */
  private def cardPartialState(spark: SparkSession, dir: String,
      pred: Column): DataFrame = {
    val all = Tables(spark, dir, "documents")
    val docs = all.filter(pred)
    val toks = graft.text.TextOps.tokens(col("text"))
    val vol = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(toks).cast("long")), lit(0L)).as("n_tokens"),
      collect_set(col("source")).as("sources"))
    val q = TextQ.qualityScore(spark, dir).filter(pred).agg(
      sum(col("quality").cast(DecimalType(10, 7))).as("q_sum"),
      count(lit(1)).as("q_n"),
      sum(col("keep").cast("long")).as("keep_sum"))
    val dec = graft.dedup.Dedup.contamination(
      corpus = all.filter(col("doc_id") % 10 =!= 0).filter(pred),
      benchmark = all.filter(col("doc_id") % 10 === 0),
      idCol = "doc_id", textCol = "text", n = 8).agg(
      coalesce(sum(col("contaminated").cast("long")), lit(0L))
        .as("n_contaminated"),
      count(lit(1)).as("corpus_n"))
    val sp = TextQ.splitAssign(spark, dir).filter(pred).agg(
      coalesce(sum((col("split") === "train").cast("long")), lit(0L))
        .as("n_train"),
      coalesce(sum((col("split") === "val").cast("long")), lit(0L))
        .as("n_val"),
      coalesce(sum((col("split") === "test").cast("long")), lit(0L))
        .as("n_test"),
      count(lit(1)).as("split_n"))
    val kmv = shingleHashes(docs)
      .agg(graft.functions.Kmv.sketchOf(col("h"), 256).as("kmv"))
    vol.crossJoin(q).crossJoin(dec).crossJoin(sp).crossJoin(kmv)
  }

  /** Finalize the card from merged batch states + the artifact rows. */
  private def dataCardFromStates(spark: SparkSession, dir: String,
      states: DataFrame): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val m = states.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      size(array_distinct(flatten(collect_list(col("sources")))))
        .cast("long").as("n_sources"),
      sum(col("q_sum")).as("q_sum"),
      sum(col("q_n")).as("q_n"),
      sum(col("keep_sum")).as("keep_sum"),
      sum(col("n_contaminated")).as("n_contaminated"),
      sum(col("corpus_n")).as("corpus_n"),
      sum(col("n_train")).as("n_train"),
      sum(col("n_val")).as("n_val"),
      sum(col("n_test")).as("n_test"),
      sum(col("split_n")).as("split_n"))
    // m re-evaluates per scalar row below — each evaluation reads the
    // two state ROWS, not the corpus, so no barrier is warranted
    def scalar(metric: String, v: Column): DataFrame =
      one(metric, m.select(v.as("v")))
    val merged = Seq(
      scalar("volume.n_docs", col("n_docs")),
      scalar("volume.n_tokens", col("n_tokens")),
      scalar("volume.n_sources", col("n_sources")),
      scalar("quality.avg_quality", rate(col("q_sum"), col("q_n"))),
      scalar("quality.keep_rate", rate(col("keep_sum"), col("q_n"))),
      scalar("decontam.contaminated_rate",
        rate(col("n_contaminated"), col("corpus_n"))),
      scalar("split.train_frac", rate(col("n_train"), col("split_n"))),
      scalar("split.val_frac", rate(col("n_val"), col("split_n"))),
      scalar("split.test_frac", rate(col("n_test"), col("split_n"))),
      // bottom-k union: feeding sketch members back through the
      // aggregator IS the merge (the kmvMergeSketches identity)
      one("sketch.shingle_ndv_est",
        states.select(explode(col("kmv")).as("h"))
          .agg(graft.functions.Kmv.sketchOf(col("h"), 256).as("sk"))
          .select(graft.functions.Kmv.estimate(col("sk"), 256).as("v"))))
    (merged ++ artifactRows(spark, dir, docs)).reduce(_ unionByName _)
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
