package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators, re-expressed Spark-first over the testdata
  * star schema. Each query mirrors an operator from SURVEY.md §2 (file:line
  * citations reference `/root/reference/`) and has a DuckDB oracle twin in
  * [[Oracles]].
  *
  * Numeric-parity convention: money aggregates are computed in
  * DECIMAL(18,2) (exact, order-independent) in BOTH engines, then cast to
  * DOUBLE for output — bit-identical across Spark and DuckDB regardless of
  * partial-aggregation order. Plain doubles are only summed when values are
  * integral (exact in IEEE754). This matters precisely because at scale the
  * summation order is nondeterministic across executors.
  */
object Core {

  /** Exact decimal view of a 2-dp money column stored as double. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // -------------------------------------------------------------------
  // A1 — hash group-by mart (reference: dbt_retail/models/marts/
  // mart_daily_sales.sql:6-15 — group by day, store; count/sum/sum).
  // Spark: partial+final hash agg, map-side combine for free; the
  // group-by key cardinality (day × status) is tiny so the shuffle is
  // negligible at any scale.
  // -------------------------------------------------------------------
  def martDailySales(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .groupBy(
        to_date(col("o_orderdate")).as("day"),
        col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("txns"),
        sum(dec(col("o_totalprice"))).cast("double").as("gross"),
        countDistinct(col("o_custkey")).as("customers"))
  }

  // -------------------------------------------------------------------
  // Incremental view maintenance of the daily mart: the don't-recompute-
  // the-world shape. The persisted state is a PARTIAL AGGREGATE at
  // (day, status, custkey) grain — one grain finer than the mart so
  // count(DISTINCT custkey), which has no mergeable partial, becomes a
  // plain count over grain rows. A new day's delta aggregates to the
  // same grain and MERGES by summing (counts and exact decimal sums are
  // both associative), then the mart derives with one final group-by.
  // At 100 TB the delta scan is |new data| and the merge shuffles
  // |state ∪ delta| grain rows — never the raw history. The DuckDB
  // oracle is the FULL recompute over all of orders, so the hash-match
  // IS the incremental ≡ full proof.
  // -------------------------------------------------------------------

  /** Mergeable partial-aggregate state at (day, status, custkey) grain. */
  private def martGrain(orders: DataFrame): DataFrame =
    orders.groupBy(
        to_date(col("o_orderdate")).as("day"),
        col("o_orderstatus").as("status"),
        col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("gross_sum"))

  def martDailySalesIncremental(spark: SparkSession, dir: String): DataFrame =
    martDailySalesIncremental(spark, dir, "1998-01-01", "mart-state")

  /** `cutDate` splits history (persisted state) from delta; the state
    * artifact key INCLUDES the cut — a name-only key would let a second
    * call with a different cut silently merge stale-cut state with the
    * new cut's delta, vanishing every row between the two cuts.
    */
  def martDailySalesIncremental(spark: SparkSession, dir: String,
      cutDate: String, artifactName: String): DataFrame = {
    val cut = lit(cutDate).cast("timestamp")
    val orders = Tables(spark, dir, "orders")
    // the "history as of yesterday" artifact, built once per JVM
    val statePath = graft.ops.StageArtifacts.ensure(
        dir, s"$artifactName-$cutDate") { out =>
      martGrain(orders.filter(col("o_orderdate") < cut))
        .write.mode("overwrite").parquet(out)
    }
    val state = spark.read.parquet(statePath)
    val delta = martGrain(orders.filter(col("o_orderdate") >= cut))
    val merged = state.unionByName(delta)
      .groupBy(col("day"), col("status"), col("custkey"))
      .agg(sum(col("n")).as("n"), sum(col("gross_sum")).as("gross_sum"))
    merged.groupBy(col("day"), col("status"))
      .agg(sum(col("n")).cast("long").as("txns"),
        sum(col("gross_sum")).cast("double").as("gross"),
        count(lit(1)).as("customers"))
  }

  // -------------------------------------------------------------------
  // A1/P2 — TPC-H Q1-shaped pricing summary: scan-heavy agg with derived
  // measures; the canonical "does partial agg + codegen survive 100×"
  // benchmark shape.
  // -------------------------------------------------------------------
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  // -------------------------------------------------------------------
  // P1/P4 — typed projection at a cast boundary + parameterized predicate
  // filter (reference: dbt stg_transactions.sql:22-43 cast TEXT→typed;
  // grocery_reconcile_dag.py:24-27 WHERE run_id=...). Both the filter and
  // the 4-column projection must reach the parquet scan (PushedFilters /
  // ReadSchema) — verified in CoreSpec.
  // -------------------------------------------------------------------
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1996-01-01") && col("l_discount") > 0.05)
      .select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("linenumber"),
        col("l_quantity").cast("long").as("qty"),
        dec(col("l_extendedprice")).cast("double").as("price"))
  }

  // -------------------------------------------------------------------
  // J1 — dim enrichment join (reference: implied fct_sales writer,
  // sql/init.sql:33-44 — denormalized region/category + derived revenue).
  // No forced broadcast hint: part/supplier GROW WITH SCALE FACTOR, so a
  // hard `broadcast()` becomes a driver/executor OOM at 100×. Catalyst's
  // size statistics (autoBroadcastJoinThreshold) + AQE pick broadcast
  // while the dims fit and fall back to a shuffle join when they don't —
  // which is exactly the size guard we want. PlanSpec asserts the
  // broadcast is chosen at test scale, where the dims are under the
  // threshold.
  // -------------------------------------------------------------------
  def joinEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val supp = Tables(spark, dir, "supplier")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand").as("brand"), col("s_name").as("supplier"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
  }

  // -------------------------------------------------------------------
  // J3 — EXISTS as left-semi join (reference: dbt_retail/tests/
  // assert_non_empty_mart.sql:2-5 NOT EXISTS probe).
  // -------------------------------------------------------------------
  def existsSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val bigOrders = Tables(spark, dir, "orders").filter(col("o_totalprice") > 100000.0)
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
  }

  // -------------------------------------------------------------------
  // K6 — idempotent seed as NOT EXISTS / left-anti join (reference:
  // sql/init.sql:47-61 INSERT ... ON CONFLICT DO NOTHING).
  // -------------------------------------------------------------------
  def antiJoinNewKeys(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("mktsegment"))
  }

  // -------------------------------------------------------------------
  // K5 — keyed upsert with last-write-wins semantics (reference:
  // grocery_lib/pg.py:33-60 INSERT ... ON CONFLICT (run_id,txn_id) DO
  // UPDATE). Spark has no in-place upsert; the set-based equivalent is
  // union + row_number over the key, newest source wins. One shuffle on
  // the merge key; at scale the base side would be bucketed on the key so
  // only the (small) update side shuffles.
  // -------------------------------------------------------------------
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val base = orders.select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), lit(1).as("src"))
    val updates = orders
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"), lit(2).as("src"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("src").desc)
    base.unionAll(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderkey").as("orderkey"), col("o_orderstatus").as("status"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
  }

  // -------------------------------------------------------------------
  // A2/V5 — row-count canary vs threshold (reference:
  // grocery_reconcile_dag.py:23-35 — count WHERE run_id=..., fail < 10).
  // -------------------------------------------------------------------
  def countCanary(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1995-01-01"))
      .agg(count(lit(1)).as("n"))
      .select(lit("orders_1995_plus").as("canary"), col("n"),
        (col("n") >= 10).as("pass"))
  }

  // -------------------------------------------------------------------
  // V3 — not_null column checks (reference: dbt_retail/models/marts/
  // schema.yml:4-21 — five not_null tests). One pass over the table,
  // null-counts for every checked column in a single aggregate (NOT one
  // scan per column — that would be 5× the IO at 100 TB).
  // -------------------------------------------------------------------
  def notNullChecks(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val agg = Tables(spark, dir, "orders").agg(
      count(lit(1)).as("total"),
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")): _*)
    // unpivot the single aggregate row into (column_name, nulls, pass)
    val stackExpr = cols.map(c => s"'$c', nulls_$c").mkString(s"stack(${cols.size}, ", ", ", ")")
    agg.select(expr(s"$stackExpr as (column_name, nulls)"))
      .select(col("column_name"), col("nulls"), (col("nulls") === 0).as("pass"))
  }

  // -------------------------------------------------------------------
  // V4 — non-empty singular test (reference: assert_non_empty_mart.sql).
  // -------------------------------------------------------------------
  def nonEmptyCheck(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .agg(count(lit(1)).as("n"))
      .select(lit("orders").as("table_name"), col("n"), (col("n") > 0).as("non_empty"))
  }

  // -------------------------------------------------------------------
  // V1 — contract validation producing an ordered violations relation
  // (reference: grocery_validate_dag.py:17-62 — JSON-Schema required/type
  // checks, all violations collected). Declarative: one scan, one
  // violation row per (record, rule) breach.
  // -------------------------------------------------------------------
  def contractViolations(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val rules: Seq[(String, Column)] = Seq(
      ("value_negative" -> (col("value") < 0)),
      ("value_over_cap" -> (col("value") > 190)),
      ("unknown_event_type" ->
        !col("event_type").isin("click", "view", "purchase", "signup", "error")),
      ("missing_user" -> col("user_id").isNull))
    val checks = array(rules.map { case (name, pred) =>
      when(pred, lit(name)).otherwise(lit(null))
    }: _*)
    ev.select(col("event_id"), explode(checks).as("violation"))
      .filter(col("violation").isNotNull)
  }

  // -------------------------------------------------------------------
  // O1/O2 — ordered limit / top-k (reference: validation-error ordering
  // grocery_validate_dag.py:57-59 "sorted, first 5"). Spark turns
  // sort+limit into TakeOrderedAndProject — no global sort at scale.
  // -------------------------------------------------------------------
  def orderedLimit(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey").as("orderkey"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
  }

  /** Top-3 orders per customer — windowed top-k (rank per group). */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_custkey").as("custkey"), col("rank"),
        col("o_orderkey").as("orderkey"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
  }

  // -------------------------------------------------------------------
  // P7/S3 — JSON field extraction (reference: raw_payload JSONB,
  // sql/init.sql:28; grocery_lib/pg.py:43 `::jsonb` cast). regexp-based
  // so the DuckDB oracle needs no JSON extension.
  // -------------------------------------------------------------------
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    // rlike guard first: ANSI mode (Spark 4 default) would throw on
    // casting the empty string regexp_extract yields for non-matches.
    Tables(spark, dir, "events")
      .filter(col("props").rlike("\"k\": \\d+"))
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
      .filter(col("k") > 80)
  }

  // -------------------------------------------------------------------
  // Rollup with subtotal rows — multi-level mart in one pass (partial
  // agg handles every grouping set map-side; no per-level rescan).
  // grouping_id bit order (first key = MSB) matches DuckDB's GROUPING.
  // -------------------------------------------------------------------
  def martRollup(spark: SparkSession, dir: String): DataFrame = {
    // month as a string key: a nullable DATE subtotal key round-trips
    // differently through pandas (NaT vs None) in the oracle compare
    Tables(spark, dir, "orders")
      .rollup(date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("txns"),
        sum(dec(col("o_totalprice"))).cast("double").as("gross"))
  }

  // -------------------------------------------------------------------
  // Pivot — status columns from rows (compiles to conditional
  // aggregation: one scan, no join).
  // -------------------------------------------------------------------
  def pivotStatus(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .groupBy(year(to_date(col("o_orderdate"))).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec(col("o_totalprice"))).cast("double"))
  }

  // -------------------------------------------------------------------
  // Set operations — INTERSECT / EXCEPT / UNION (distinct semantics).
  // Spark plans these as semi/anti joins + dedup aggregates.
  // -------------------------------------------------------------------
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val withOrders = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("custkey"))
    def seg(s: String) = cust.filter(col("c_mktsegment") === s)
      .select(col("c_custkey").as("custkey"))
    seg("AUTOMOBILE").intersect(withOrders)
      .union(seg("BUILDING").except(withOrders))
      .distinct()
  }

  /** q_bucketed_join: the co-located join — orders and customer are
    * bucketed on their join key at write time
    * ([[graft.ops.Bucketing]]), so the SortMergeJoin itself plans with
    * ZERO ShuffleExchange (BucketingSpec pins that plan): the shuffle
    * was paid once by the layout job, not per query. The MERGE hint
    * keeps the demonstration deterministic (a stats-based broadcast
    * would also skip the exchange, but for the other reason).
    * Aggregation above the join shuffles |nations| rows — negligible.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (o, c) = graft.ops.Bucketing.bucketedOrdersCustomer(spark, dir)
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
  }

  // -------------------------------------------------------------------
  // Exact percentiles per group — `percentile` uses the standard
  // (n−1)p linear interpolation, the same formula as DuckDB's
  // quantile_cont, so values are cross-engine exact.
  // -------------------------------------------------------------------
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))
  }
}
