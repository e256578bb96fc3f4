package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Barrier.Ops
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

  /** Token-budget selection: fill a fixed training-token budget with
    * the best documents — order by (quality desc, doc_id) and keep
    * documents while the running token total fits. The "spend a 1B-token
    * budget on the best half" curation op.
    *
    * The running total uses the same two-phase distributed prefix sum
    * as [[graft.text.Packing]] (the naive global-order window plans
    * Exchange SinglePartition): quality in [0,1] buckets by VALUE RANGE
    * (descending — bucket boundaries respect the global order),
    * per-bucket totals come to the driver (O(buckets) longs), exclusive
    * bucket bases broadcast back, and the per-row cumsum is a window
    * WITHIN each bucket. The total corpus token count falls out of the
    * same O(buckets) driver pass, so budget = total/2 costs nothing
    * extra.
    */
  def budgetSelect(spark: SparkSession, dir: String,
      buckets: Int = 32): DataFrame = {
    val q = TextQ.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      // feeds phase 1 (totals) AND phase 2 (cumsum): score once
      .withColumn("bucket", least(
        floor((lit(1.0) - col("quality")) * buckets),
        lit(buckets - 1)).cast("int"))
      .barrierOnce()
    val totals = q.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = totals.valuesIterator.sum
    val budget = total / 2
    val baseRows = (0 until buckets).scanLeft(0L) { (acc, b) =>
      acc + totals.getOrElse(b, 0L)
    }.init.zipWithIndex.map { case (base, b) => (b, base) }
    import spark.implicits._
    val bases = broadcast(baseRows.toDF("bucket", "base"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.join(bases, "bucket")
      .withColumn("cum_tokens", (col("base") + sum(col("n_tokens")).over(w))
        .cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("cum_tokens"), (col("cum_tokens") <= budget).as("selected"))
  }

  /** TEMPERATURE-scaled mixture sampling — the published multilingual
    * training-mix rule (α = 0.5: sample source s with weight
    * n_s^α / Σ_t n_t^α, the √n rule of Conneau & Lample 2019 / XLM-R):
    * each source gets a TOKEN budget B_s = ⌊B · √n_s / Σ√n_t⌋ out of a
    * global budget B = total/4, flattening the mixture's power law —
    * big sources downsample hard, small sources keep nearly everything
    * — where [[mixtureRebalance]]'s uniform per-source doc cap ignores
    * both token mass and the temperature exponent. Selection within a
    * source is content-hash ordered (reproducible, ingestion-order
    * unbiased).
    *
    * Weight math is cross-engine exact: √n is one correctly-rounded
    * IEEE op, rounded at 6 dp into DECIMAL(28,6) so the denominator is
    * an EXACT decimal sum (order-free), and the final
    * (srt/denom)·B is two IEEE ops on identical operands — so budgets,
    * and therefore the kept set, hash-match the DuckDB replay.
    *
    * The per-source running token total uses the [[graft.text.Packing]]
    * two-phase distributed prefix sum, keyed: docs hash into value-range
    * buckets of the order key, per-(source, bucket) totals come to the
    * driver (O(|S|·buckets) longs), exclusive bases broadcast back, and
    * the cumsum window runs within each (source, bucket) — no source
    * ever collapses into a single task, however skewed the mixture.
    */
  def temperatureMixture(spark: SparkSession, dir: String,
      buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val hashMod = 1000000007L
    val width = (hashMod + buckets - 1) / buckets
    val keyed = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.rollingHash(TextOps.normalize(col("text"))).as("okey"))
      .withColumn("bucket", (col("okey") / lit(width)).cast("int"))
      .barrierOnce()
    // phase 1: per-(source, bucket) token totals -> driver
    val totals = keyed.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val perSource = totals.groupMapReduce(_._1._1)(_._2)(_ + _)
    val budget = perSource.values.sum / 4
    // temperature weights and budgets computed through Spark
    // expressions (NOT driver math) so round/cast semantics are the
    // same functions the oracle replays
    val st = perSource.toSeq.sortBy(_._1).toDF("source", "n_s")
      .withColumn("srt",
        round(sqrt(col("n_s").cast("double")), 6).cast(DecimalType(28, 6)))
    val denom = st.agg(sum(col("srt"))).collect()(0).getDecimal(0)
    val budgets = st.select(col("source"),
      floor(col("srt").cast("double") / lit(denom.doubleValue) *
        lit(budget.toDouble)).as("budget_tokens"))
    // phase 2: exclusive (source, bucket) bases + in-bucket cumsum
    val baseRows = perSource.keys.toSeq.sorted.flatMap { s =>
      var acc = 0L
      (0 until buckets).map { b =>
        val base = acc
        acc += totals.getOrElse((s, b), 0L)
        (s, b, base)
      }
    }
    val bases = broadcast(baseRows.toDF("source", "bucket", "base"))
    val w = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("okey").asc_nulls_first, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(bases, Seq("source", "bucket"))
      .withColumn("cum_tokens", col("base") + sum(col("n_tokens")).over(w))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("cum_tokens") <= col("budget_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("budget_tokens"))
  }

  /** Curriculum interleaving by stride scheduling: every document gets
    * the order key frac = rn/|source| — sorting by (frac, source,
    * doc_id) interleaves the sources PROPORTIONALLY (each source
    * advances at the pace of its size; after any prefix of length L,
    * source s has contributed L·n_s/N ± 1 docs). The training-mix
    * scheduler: a run that reads the corpus in this order consumes
    * every source evenly instead of front-loading whichever was
    * ingested first.
    *
    * The output is the ORDER KEY, not a materialized global position —
    * a global row_number would plan a single-partition window, while
    * the key is computed with one per-source window + a broadcast of
    * the source counts, and the consumer realizes the order as a
    * range-partitioned sort. frac is one exact-integer double division,
    * so the whole thing is DuckDB-oracled.
    */
  def curriculumInterleave(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val bySource = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
    docs.withColumn("rn", row_number().over(bySource).cast("long"))
      .join(broadcast(counts), "source")
      .withColumn("frac",
        col("rn").cast("double") / col("n_source").cast("double"))
      .select(col("doc_id"), col("source"), col("rn"), col("n_source"),
        col("frac"))
  }
}
