package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The retail dbt pipeline re-expressed in Spark SQL (reference: seed →
  * dbt run → dbt test chain, SURVEY.md §3.2; models at
  * dbt_retail/models/staging/stg_transactions.sql and
  * marts/mart_daily_sales.sql; dbt compile + Postgres planner are both
  * replaced by Catalyst).
  *
  * ANSI mode (Spark 4 default) reproduces Postgres fail-fast semantics:
  * bad_data's `amount_cents='oops'` breaks the staging cast exactly like
  * PG's `::integer` (stg_transactions.sql:38), and logic_bug's `/0` raises
  * instead of returning null.
  */
object RetailPipeline {

  /** Seeded source rows — amount_cents deliberately TEXT "to simulate
    * bad-data issues" (retail_seed_dag.py:36,49-57). Scenario mutations
    * per retail_seed_dag.py:60-113.
    */
  def seedSource(spark: SparkSession, scenario: String): DataFrame = {
    import spark.implicits._
    val ok = Seq(
      ("t1", 101, "banana", "199", 1, "2024-03-05 09:15:00"),
      ("t2", 101, "apple", "299", 2, "2024-03-05 11:40:00"),
      ("t3", 102, "milk", "499", 1, "2024-03-05 13:05:00"))
    val rows = scenario match {
      case "bad_data" =>
        // amount_cents='oops' breaks the downstream cast (retail_seed_dag.py:86-94)
        ok.updated(1, ("t2", 101, "apple", "oops", 2, "2024-03-05 11:40:00"))
      case "upstream_missing" => Seq.empty // table exists, zero rows (:76-78)
      case "race_partial" => Seq.empty     // rows arrive after the consumer ran (:117-132)
      case _ => ok
    }
    val df = rows.toDF("transaction_id", "store_id", "sku", "amount_cents",
      "quantity", "transaction_ts")
    if (scenario == "schema_drift")
      df.withColumnRenamed("quantity", "qty") // DDL drift (:60-67)
    else df
  }

  /** Staging model: TEXT→typed cast boundary (stg_transactions.sql:22-43),
    * including the scenario-injected model bugs compiled from the dbt
    * Jinja conditionals (:15-39). Materialized as a view
    * (dbt_project.yml:20-22).
    */
  def stgTransactions(src: DataFrame, scenario: String): DataFrame = {
    val amount: org.apache.spark.sql.Column = scenario match {
      case "model_bug" => col("amount_cent").cast("int")       // wrong column (:28-29)
      case "logic_bug" => (col("amount_cents").cast("int") / 0).cast("int") // ÷0 (:30-32)
      case _ => col("amount_cents").cast("int")
    }
    src.select(
      col("transaction_id").cast("string").as("transaction_id"),
      col("store_id").cast("int").as("store_id"),
      col("sku").cast("string").as("sku"),
      amount.as("amount_cents"),
      col("quantity").cast("int").as("quantity"),
      col("transaction_ts").cast("timestamp").as("transaction_ts"))
  }

  /** The staging model as dbt-compiled SQL TEXT over `transactions_src`
    * (stg_transactions.sql:12-46 with the scenario Jinja branches
    * resolved — the reference ships the model as SQL, and so do we for
    * the pipeline path; [[stgTransactions]] stays as the programmatic
    * DataFrame form of the same model).
    *
    * syntax_bug reproduces the intentionally missing comma at
    * stg_transactions.sql:33-35: Catalyst's parser raises a
    * ParseException at compile, the same failure class dbt surfaces.
    */
  def stgModelSql(scenario: String): String = {
    val amount = scenario match {
      case "model_bug" => "cast(amount_cent as integer) as amount_cents,"  // wrong column (:28-29)
      case "logic_bug" => "cast(amount_cents as integer) / 0 as amount_cents," // ÷0 (:30-32)
      case "syntax_bug" => "cast(amount_cents as integer) as amount_cents" // missing comma (:33-35)
      case _ => "cast(amount_cents as integer) as amount_cents,"
    }
    s"""select
       |  cast(transaction_id as string) as transaction_id,
       |  cast(store_id as int) as store_id,
       |  cast(sku as string) as sku,
       |  $amount
       |  cast(quantity as int) as quantity,
       |  cast(transaction_ts as timestamp) as transaction_ts
       |from transactions_src""".stripMargin
  }

  /** Mart model: day × store aggregation (mart_daily_sales.sql:6-15),
    * materialized as a table (dbt_project.yml:23-25).
    */
  def martDailySales(stg: DataFrame): DataFrame = {
    stg.groupBy(
      to_date(date_trunc("day", col("transaction_ts"))).as("day"),
      col("store_id"))
      .agg(
        count(lit(1)).as("txns"),
        sum(col("amount_cents").cast("long")).as("gross_amount_cents"),
        sum(col("quantity").cast("long")).as("units"))
  }

  /** dbt test suite: five not_null column tests (schema.yml:4-21) + the
    * singular non-empty test (assert_non_empty_mart.sql).
    */
  def qualityChecks(mart: DataFrame): Seq[CheckResult] =
    Checks.notNull(mart,
      Seq("day", "store_id", "txns", "gross_amount_cents", "units")) :+
      Checks.nonEmpty(mart, "mart_daily_sales")

  /** seed → stg view (compiled from SQL text) → mart table → tests, with
    * Catalyst in place of the dbt compiler. The failure classes mirror
    * dbt's: parse errors (syntax_bug) at compile, unresolved references
    * (source_bug wrong name; dependency_issue dropped dependency;
    * model_bug wrong column) at analysis, cast/÷0 (bad_data, logic_bug)
    * at run under ANSI.
    */
  def run(spark: SparkSession, scenario: String): DataFrame = {
    val src = seedSource(spark, scenario)
    src.createOrReplaceTempView("transactions_src")
    if (scenario == "dependency_issue")
      // the seed dependency "never ran"/was dropped before the model
      // (retail_seed_dag.py:39-43): the model's source reference cannot
      // resolve, by the CORRECT name — unlike source_bug's typo
      spark.catalog.dropTempView("transactions_src")
    val stg = scenario match {
      case "source_bug" =>
        stgTransactions(spark.table("transactions_sr"), scenario) // wrong source name (:15-17)
      case _ => spark.sql(stgModelSql(scenario))
    }
    stg.createOrReplaceTempView("stg_transactions") // view materialization
    val mart = martDailySales(spark.table("stg_transactions"))
    mart.cache() // table materialization stand-in; tests + reads hit this
    Checks.assertAll(qualityChecks(mart))
    mart
  }
}
