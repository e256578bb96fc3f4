package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based approximate aggregations — the operators that replace
  * exact distinct/quantile at 100 TB, where exact answers need a full
  * shuffle of every distinct value but a sketch is a few KB per
  * partition merged associatively (map-side combinable, one narrow
  * reduce). Results are engine-specific (DataSketches HLL / KLL-style
  * quantiles), so the driver records rows-only; SketchQSpec bounds the
  * error against the exact answers.
  */
object SketchQ {

  /** Per-status distinct customers: exact vs HLL sketch estimate
    * (lgConfigK=12 → ~1.6% standard error), plus a merged union across
    * groups via hll_union_agg — the pattern for pre-aggregated distinct
    * counts over arbitrary dimension rollups.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    orders
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        countDistinct(col("o_custkey")).as("exact"),
        hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12)))
          .as("estimate"))
  }

  /** Heavy hitters: the 20 most frequent document tokens by Misra–Gries
    * summary (k=64, O(k) mergeable state, est ≤ true ≤ est + shed) with
    * the summary's shed weight alongside each estimate — the one-pass
    * answer to "what are the dominant items" when an exact groupBy of
    * every distinct token is a full shuffle. On THIS corpus the output
    * is provably exact (k exceeds the distinct-token count, so no trim
    * ever sheds and the oracle compares against true counts with
    * shed = 0); MisraGriesSpec pins the approximate invariants at
    * adversarial k.
    *
    * That exactness contract is GUARDED, not assumed: if regenerated
    * testdata (or a larger SF) ever widens the vocabulary past k, the
    * summary sheds and the query raises instead of letting the oracle
    * compare drift into a near-miss with no pointer at the cause.
    */
  def frequentTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
    toks
      .agg(graft.functions.MisraGries.ofColumn(col("t"), 64).as("s"))
      .select(explode(col("s.items")).as(Seq("token", "est")),
        when(col("s.shed") > 0, raise_error(concat(
          lit("frequent_tokens: Misra-Gries shed "),
          col("s.shed").cast("string"),
          lit(" — vocabulary exceeds k=64, the exact-top-20 oracle no " +
            "longer holds; raise k or switch the oracle to bound-checks"))))
          .otherwise(col("s.shed")).as("shed"))
      .orderBy(col("est").desc, col("token"))
      .limit(20)
  }

  /** Approximate per-status percentiles (percentile_approx with
    * accuracy 10000) next to the exact values.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("percentile_approx(o_totalprice, 0.5, 10000)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.99)").as("exact_p99"),
        expr("percentile_approx(o_totalprice, 0.99, 10000)").as("approx_p99"))
  }

  /** Per-event-type distinct users by the ORACLED from-scratch HLL
    * ([[graft.functions.Hll]]): registers built from the two native
    * rolling-hash coordinates, estimate + integer register checksums
    * replayed formula-for-formula in DuckDB — the hash-gated member of
    * the sketch family next to the engine-native (rows-only)
    * `approxDistinct`.
    *
    * No distinct anywhere on the Spark side: duplicates fold into the
    * same register via max, which is the point — one narrow pass, 1 KB
    * of mergeable state per group map-side-combined, vs the exact
    * count's shuffle of every distinct (type, user) pair. `exact_ndv`
    * rides along as the validation column (it IS that exact shuffle);
    * at 100 TB you drop it and keep the sketch.
    */
  def hllNdv(spark: SparkSession, dir: String): DataFrame =
    hllPacked(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        graft.functions.Hll.estimateOf(col("packed")).as("r"),
        countDistinct(col("user_id")).as("exact_ndv"))
      .select(col("event_type"),
        col("r.reg_sum").as("reg_sum"),
        col("r.reg_checksum").as("reg_checksum"),
        col("r.zero_regs").as("zero_regs"),
        round(col("r.est"), 4).as("est_ndv"),
        col("exact_ndv"))

  /** (event_type, user_id, ts, packed) — the per-row HLL coordinates:
    * bucket from h1, rank from the 30-bit-rescaled h2, packed as
    * bucket·32 + rank (the [[graft.functions.Hll]] input convention).
    */
  private def hllPacked(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Hll, RollingHash, RollingHash2}
    Tables(spark, dir, "events")
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"), col("ts"),
        col("user_id").cast("string").as("s"))
      .select(col("event_type"), col("user_id"), col("ts"),
        RollingHash.ofColumn(col("s")).as("h1"),
        RollingHash2.ofColumn(col("s")).as("h2"))
      // rescale h2 onto the full 30-bit domain, then rank = 31 - bitLength
      .withColumn("w", expr("h2 * 1073741824L DIV 998244353L"))
      .withColumn("rank",
        when(col("w") === 0, lit(31)).otherwise(lit(31) - length(bin(col("w")))))
      .withColumn("packed",
        (col("h1") % Hll.M) * (1 << Hll.RankBits) + col("rank"))
  }

  /** Per-(event_type, day) partial sketches persisted as a parquet
    * artifact — the daily-ingest shape: each day's partition is
    * sketched ONCE into 1 KB register files; any later rollup merges
    * blobs instead of re-scanning rows.
    */
  def writeHllSketchArtifact(spark: SparkSession, dir: String,
      outPath: String): Unit =
    hllPacked(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.Hll.sketchOf(col("packed")).as("regs"))
      .write.mode("overwrite").parquet(outPath)

  /** Compose twin of [[hllNdv]]: the per-type estimate served by
    * MERGING the persisted daily register files — shares q_hll_ndv's
    * oracle VERBATIM (register-wise max is associative over any
    * partitioning, so merged partials are bit-identical to the
    * single-pass sketch; identical results from the artifact IS the
    * contract). `exact_ndv` stays a fresh exact pass — it is the
    * validation column, not part of the served sketch.
    */
  def hllNdvCompose(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.ops.StageArtifacts.ensure(dir, "hllsketch") { out =>
      writeHllSketchArtifact(spark, dir, s"$out/hll_daily")
    }
    val merged = spark.read.parquet(s"$stage/hll_daily")
      .groupBy(col("event_type"))
      .agg(graft.functions.Hll.mergeEstimateOf(col("regs")).as("r"))
    val exact = Tables(spark, dir, "events")
      .where(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_ndv"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"),
        col("r.reg_sum").as("reg_sum"),
        col("r.reg_checksum").as("reg_checksum"),
        col("r.zero_regs").as("zero_regs"),
        round(col("r.est"), 4).as("est_ndv"),
        col("exact_ndv"))
  }
}
