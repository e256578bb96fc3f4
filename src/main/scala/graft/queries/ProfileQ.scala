package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Barrier.Ops

/** Table-profiling queries — the ANALYZE-style statistics a cost-based
  * planner (and a data-quality gate) feeds on: per-column
  * count/nulls/NDV/min/max, and an equi-width value histogram.
  *
  * Shape at 100 TB: one aggregate per column, each scanning ONLY its
  * column (parquet column pruning makes 8 single-column passes read the
  * same bytes as one full-width pass, and each parallelizes
  * independently); the union is metadata-sized. NDV here is exact
  * count(DISTINCT) so the DuckDB oracle can replay it bit-for-bit — at
  * scale the swap-in is approx_count_distinct (HLL, one pass, no
  * Expand), which `q_approx_distinct` already exercises.
  */
object ProfileQ {

  private val numericCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Exact per-column statistics over lineitem's numeric columns. */
  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    numericCols.map { c =>
      li.agg(
        count(lit(1)).cast("long").as("n"),
        (count(lit(1)) - count(col(c))).cast("long").as("nulls"),
        count_distinct(col(c)).cast("long").as("ndv"),
        min(col(c)).cast("double").as("min_val"),
        max(col(c)).cast("double").as("max_val"))
        .select(lit(c).as("column"), col("n"), col("nulls"), col("ndv"),
          col("min_val"), col("max_val"))
    }.reduce(_ union _)
  }

  /** Equi-width 10-bucket histogram of l_extendedprice: bucket bounds
    * derive from the exact min/max (two-pass — the scan is narrow and
    * the stats row broadcasts), the top edge closes into the last
    * bucket. Every float step is mirrored verbatim in the oracle.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val nb = 10
    val li = Tables(spark, dir, "lineitem").select(col("l_extendedprice"))
    val stats = li.agg(min(col("l_extendedprice")).cast("double").as("mn"),
      max(col("l_extendedprice")).cast("double").as("mx"))
    li.crossJoin(broadcast(stats))
      .withColumn("width", (col("mx") - col("mn")) / lit(nb.toDouble))
      // degenerate-range guard: min == max makes the bucket expression
      // 0/0 = NaN, which Spark would silently cast to 0 while the
      // oracle's NaN->BIGINT cast errors — a constant column must land
      // in bucket 0 identically in both engines
      .withColumn("bucket", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(
          floor((col("l_extendedprice") - col("mn")) / col("width")),
          lit(nb - 1).cast("long"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        // width is constant; min/max make it visible post-groupBy
        min(col("mn")).as("mn"), min(col("width")).as("w"))
      .select(col("bucket"), col("n"),
        (col("mn") + col("bucket").cast("double") * col("w")).as("lo"),
        (col("mn") + (col("bucket").cast("double") + lit(1.0)) * col("w"))
          .as("hi"))
  }

  /** Per-group z-score outliers over `events.value`: rows more than 3
    * population-σ from their event_type's mean — the anomaly gate a
    * quality pipeline runs before trusting a day's ingest.
    *
    * Cross-engine exactness (the reason this doesn't use
    * `stddev_pop`): double sums are addition-order-dependent, so the
    * moments go through EXACT decimal sums instead — value is pinned to
    * DECIMAL(18,6) (a double is never exactly a 6dp midpoint, so the
    * cast is rounding-mode-independent), Σx and Σx² accumulate as
    * decimals, and only the final mean/variance/z arithmetic happens in
    * IEEE doubles, identically in both engines. The |z| > 3 cut is
    * therefore bit-deterministic — no threshold-margin hazard.
    *
    * Scale shape: one narrow scan for the 5-row moment table
    * (map-side-combinable decimal sums), broadcast back, one
    * filter-project pass. Output is |outliers|, not |events|.
    */
  def outliers(spark: SparkSession, dir: String): DataFrame =
    outliersOf(Tables(spark, dir, "events"))

  /** Winsorized per-group statistics: values clipped at the exact
    * interpolated p05/p95 before the mean — the robust-moments
    * companion to [[outliers]] (a z-gate flags the tail; winsorization
    * bounds its influence on the baseline).
    *
    * Exactness: Spark's `percentile` and DuckDB's `quantile_cont` are
    * the same exact interpolated definition (proven by q_percentiles);
    * clipping is least/greatest over bit-identical doubles; the clipped
    * mean goes through an exact DECIMAL(18,6) sum like every money
    * aggregate. One scan for the 5-row quantile table, broadcast back,
    * one aggregating pass.
    */
  def winsorized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val qs = ev.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.05)").as("p05"),
      expr("percentile(value, 0.95)").as("p95"))
    ev.join(broadcast(qs), "event_type")
      .withColumn("clipped",
        least(greatest(col("value"), col("p05")), col("p95"))
          .cast(DecimalType(18, 6)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") < col("p05") || col("value") > col("p95"))
          .cast("long")).as("n_clipped"),
        min(col("p05")).as("p05"), min(col("p95")).as("p95"),
        sum(col("clipped")).as("wsum"))
      .select(col("event_type"), col("n"), col("n_clipped"),
        col("p05"), col("p95"),
        (col("wsum").cast("double") / col("n").cast("double"))
          .as("win_mean"))
  }

  /** Quantile discretization: per-type value deciles via ntile(10) over
    * a deterministic (value, event_id) order — the feature-bucketing
    * preprocessing step, rank-exact in both engines.
    */
  def deciles(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
  }

  /** Per-join-key skew profile — the diagnostic run BEFORE choosing a
    * join strategy: a key whose max/avg ratio explodes wants salting
    * ([[graft.ops.SkewJoin]]) or an AQE skew split; a key with tiny NDV
    * wants a broadcast of the other side. One summary row per analyzed
    * key: row/key counts, max and interpolated p50/p90/p99 of the
    * per-key frequency distribution, the max/avg skew factor, and the
    * share of rows held by the 10 hottest keys.
    *
    * Scale shape per key: one map-side-combinable count shuffle on the
    * key, then the frequency distribution is COMPRESSED to
    * counts-of-counts (|distinct frequency values| rows — hundreds,
    * data-size-independent) and percentiles come from Spark's
    * frequency-weighted `percentile(c, p, n)` over that tiny frame —
    * identical to the expanded multiset, with no global sort of keys.
    * Top-10 hot keys ride a distributed TakeOrderedAndProject; their
    * summed share is tie-invariant (equal counts sum equally whichever
    * keys are picked).
    */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val keys = Seq(
      "l_orderkey" -> li, "l_partkey" -> li, "l_suppkey" -> li,
      "o_custkey" -> Tables(spark, dir, "orders"))
    keys.map { case (k, df) => keySkewOf(df, k) }.reduce(_ unionByName _)
  }

  /** The profile of one key column of one frame (see [[keySkew]]). */
  private[queries] def keySkewOf(df: DataFrame, k: String): DataFrame = {
    val kc = df.groupBy(col(k).as("k")).agg(count(lit(1)).as("c"))
    val coc = kc.groupBy("c").agg(count(lit(1)).as("n"))
    val top10 = kc.orderBy(col("c").desc, col("k")).limit(10)
      .agg(sum(col("c")).as("top10_rows"))
    coc.agg(
      sum(col("c") * col("n")).as("n_rows"),
      sum(col("n")).as("n_keys"),
      max(col("c")).as("max_cnt"),
      expr("percentile(c, array(0.5, 0.9, 0.99), n)").as("pcts"))
      .crossJoin(top10)
      .select(
        lit(k).as("key_name"), col("n_rows"), col("n_keys"),
        col("max_cnt"),
        (col("n_rows").cast("double") / col("n_keys").cast("double"))
          .as("avg_cnt"),
        col("pcts").getItem(0).as("p50"),
        col("pcts").getItem(1).as("p90"),
        col("pcts").getItem(2).as("p99"),
        (col("max_cnt").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")))
          .as("skew"),
        (col("top10_rows").cast("double") / col("n_rows").cast("double"))
          .as("top10_share"))
  }

  /** Per-label embedding-centroid drift — the embedding-space twin of
    * the token-distribution drift: how far each label group's mean
    * vector points away from the corpus mean. A group whose centroid
    * cosine falls is collapsing toward (or fleeing) the mixture — the
    * signal that re-weighting or re-embedding is due before training.
    *
    * Cross-engine exactness (the [[graft.ann.Prototype]] contract,
    * taken further): per-(label, dim) sums of DECIMAL(18,9)-cast
    * elements are exact and addition-order-free; the global per-dim
    * sums DERIVE from the label sums (no second corpus pass); and
    * because cosine is scale-invariant, centroid cosine == cosine of
    * the SUM vectors — so dot and norms² are computed entirely in
    * decimals (18,9 × 18,9 → 37,18 products, no precision cap hit) and
    * exactly one double expression, written identically in the oracle
    * (`dot / (sqrt(na2) · sqrt(nb2))`), produces the score. The
    * DECIMAL(18,9) down-casts bound |sum| < 1e9: unit-norm embeddings
    * keep per-dim sums ≤ n_vecs, so this holds to ~1e9 rows per label;
    * beyond that widen the scale allocation.
    *
    * Scale shape: one posexplode pass collapsed by a map-side-
    * combinable (label, dim) partial aggregate (shuffle = |labels|·d
    * rows), a broadcast join on the d-row global sums, |labels| rows
    * out. The corpus is scanned once.
    */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = Tables(spark, dir, "embeddings")
      .select(col("label"), posexplode(
        transform(col("embedding"), x => x.cast(DecimalType(18, 9))))
        .as(Seq("i", "x")))
    val sl = base.groupBy(col("label"), col("i"))
      .agg(sum(col("x")).as("s0"), count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        col("s0").cast(DecimalType(18, 9)).as("s"), col("n"))
      // feeds the global sums AND the scoring join: checkpoint makes
      // the scan-once shape structural (tokenDrift's contract), not
      // dependent on ReuseExchange firing
      .barrierOnce()
    val sg = sl.groupBy(col("i"))
      .agg(sum(col("s")).cast(DecimalType(18, 9)).as("g"))
    sl.join(broadcast(sg), "i")
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vecs"), // n is the label count for every dim
        sum(col("s") * col("g")).as("dot"),
        sum(col("s") * col("s")).as("na2"),
        sum(col("g") * col("g")).as("nb2"))
      .select(col("label"), col("n_vecs"),
        (col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
          .cast(DecimalType(18, 6)).cast("double").as("centroid_cosine"))
  }

  /** The gate over any (event_id, event_type, value) frame. */
  private[queries] def outliersOf(events: DataFrame): DataFrame =
    // baseline and scoring delegate to AnomalyGate — the ONE definition
    // the streaming sink shares
    graft.ops.AnomalyGate.gate(events,
      graft.ops.AnomalyGate.moments(events))
}
