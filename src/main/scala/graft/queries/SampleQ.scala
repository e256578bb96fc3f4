package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Deterministic stratified sampling: per stratum (language), keep the
  * first ⌈fraction·n⌉ documents ordered by content hash. Ordering by a
  * CONTENT hash instead of position/id makes the sample unbiased w.r.t.
  * ingestion order while staying fully reproducible — rerunning the
  * pipeline selects the identical sample, and the DuckDB oracle
  * recomputes it exactly (the hash is the cross-engine Rabin–Karp
  * fold). One shuffle on the stratum key.
  */
object SampleQ {

  /** Mixture REBALANCING — the training-mix op stratified sampling is
    * not: instead of taking a fraction of every stratum (which preserves
    * the mixture), cap every source at the same absolute budget
    * ⌈budget·N/nSources⌉ so over-represented sources downsample toward a
    * uniform mix while small sources keep everything. Selection within a
    * source is content-hash ordered (reproducible, ingestion-order
    * unbiased, and a re-crawled duplicate keeps its selection verdict).
    *
    * N and nSources are metadata-sized driver lookups (parquet row-group
    * stats + a distinct over the tiny source dimension), so the plan
    * stays ONE window shuffle on the source key — no global
    * single-partition count-over-all window.
    */
  def mixtureRebalance(spark: SparkSession, dir: String,
      budget: Double = 0.5): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val total = docs.count()
    // non-null filter pins SQL COUNT(DISTINCT) semantics (the oracle's):
    // DataFrame.distinct would count a NULL source as one more source
    // and silently shift the cap
    val nSources = docs.select(col("source"))
      .filter(col("source").isNotNull).distinct().count()
    val cap = math.ceil(budget * total / nSources).toLong
    val byHash = Window.partitionBy(col("source"))
      .orderBy(col("h").asc_nulls_first, col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        TextOps.rollingHash(TextOps.normalize(col("text"))).as("h"))
      .withColumn("rn", row_number().over(byHash).cast("long"))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("source"), col("rn"))
  }

  /** Quality-WEIGHTED sampling — upsample good text, downsample bad:
    * each doc is kept with probability = its quality score, decided by
    * comparing a content-hash draw against the score (hash mod 10^6 <
    * quality·10^6). Pure arithmetic over the DECIMAL-exact quality
    * composite, so the kept set is deterministic, reproducible across
    * engines, and independent of ingestion order — "random" enough for
    * mixing (the Rabin–Karp hash is uniform over content) with none of
    * an RNG's irreproducibility. Narrow pass, no shuffle.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val q = TextQ.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    val draw = pmod(TextOps.rollingHash(TextOps.normalize(col("text"))),
      lit(1000000L))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), draw.as("draw"))
      .join(q, "doc_id")
      .withColumn("keep", col("draw").cast("double") < col("quality") * 1e6)
      .select(col("doc_id"), col("draw"), round(col("quality"), 6).as("quality"),
        col("keep"))
  }

  def stratifiedSample(spark: SparkSession, dir: String,
      fraction: Double = 0.1): DataFrame = {
    // NULLS FIRST pinned explicitly: Spark's ASC default is nulls-first
    // but DuckDB's is nulls-last — a null text would silently shift
    // sample membership between engines
    val byHash = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc_nulls_first, col("doc_id"))
    val all = Window.partitionBy(col("lang"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextOps.rollingHash(TextOps.normalize(col("text"))).as("h"))
      .withColumn("rn", row_number().over(byHash).cast("long"))
      .withColumn("cnt", count(lit(1)).over(all))
      .filter(col("rn") <= ceil(col("cnt") * fraction))
      .select(col("doc_id"), col("lang"), col("rn"))
  }
}
