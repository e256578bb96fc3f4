package graft.etl

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Retail dbt-path scenario matrix (FIXTURES.md §3/§4). ANSI mode gives
  * Postgres fail-fast parity for bad casts and ÷0.
  */
class RetailPipelineSpec extends AnyFunSuite with SparkSpec {

  test("ok: golden mart values (FIXTURES.md §3)") {
    val mart = RetailPipeline.run(spark, "ok")
    val rows = mart.collect().map { r =>
      r.getAs[Int]("store_id") ->
        ((r.getAs[Long]("txns"), r.getAs[Long]("gross_amount_cents"), r.getAs[Long]("units")))
    }.toMap
    assert(rows(101) == ((2L, 498L, 3L)))
    assert(rows(102) == ((1L, 499L, 1L)))
    assert(mart.select("day").distinct().count() == 1)
  }

  test("bad_data: 'oops' breaks the staging cast (ANSI = PG parity)") {
    val e = intercept[Exception] { RetailPipeline.run(spark, "bad_data") }
    assert(e.getMessage.toLowerCase.contains("oops") ||
      e.getMessage.contains("CAST_INVALID_INPUT"), e.getMessage)
  }

  test("schema_drift: renamed quantity column fails analysis in staging") {
    intercept[AnalysisException] { RetailPipeline.run(spark, "schema_drift") }
  }

  test("model_bug: wrong column name fails analysis") {
    intercept[AnalysisException] { RetailPipeline.run(spark, "model_bug") }
  }

  test("source_bug: wrong source table fails resolution") {
    intercept[AnalysisException] { RetailPipeline.run(spark, "source_bug") }
  }

  test("syntax_bug: the broken model SQL fails at parse (dbt compile parity)") {
    val e = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      RetailPipeline.run(spark, "syntax_bug")
    }
    assert(e.getMessage.contains("PARSE_SYNTAX_ERROR"), e.getMessage)
  }

  test("dependency_issue: dropped seed dependency fails resolution by its CORRECT name") {
    val e = intercept[AnalysisException] {
      RetailPipeline.run(spark, "dependency_issue")
    }
    // distinct from source_bug: the reference is correct, the dependency
    // is missing — the error names transactions_src itself
    assert(e.getMessage.contains("transactions_src"), e.getMessage)
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), e.getMessage)
  }

  test("logic_bug: division by zero raises under ANSI") {
    val e = intercept[Exception] { RetailPipeline.run(spark, "logic_bug") }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO") ||
      e.getMessage.toLowerCase.contains("divide"), e.getMessage)
  }

  test("upstream_missing / race_partial: empty source fails the non-empty mart test") {
    intercept[DataQualityError] { RetailPipeline.run(spark, "upstream_missing") }
    intercept[DataQualityError] { RetailPipeline.run(spark, "race_partial") }
  }
}
