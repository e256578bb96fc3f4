package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Core, DedupQ}
import graft.testkit.SparkSpec

/** Column-level lineage over real engine queries: every assertion pins
  * the (output column → source table.column) map the analyzed plan
  * implies — aggregates, multi-table joins, rollup Expand, and the
  * composed curation verdict.
  */
class LineageSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("aggregate mart: measures trace to their source columns; count(*) to none") {
    val df = Core.martDailySales(spark, dir)
    assert(Lineage.sourcesOf(df, "day") == Set("orders" -> "o_orderdate"))
    assert(Lineage.sourcesOf(df, "status") == Set("orders" -> "o_orderstatus"))
    assert(Lineage.sourcesOf(df, "gross") == Set("orders" -> "o_totalprice"))
    assert(Lineage.sourcesOf(df, "customers") == Set("orders" -> "o_custkey"))
    assert(Lineage.sourcesOf(df, "txns").isEmpty) // count(lit(1))
  }

  test("three-table join: each output column names its own table") {
    val df = Core.joinEnrich(spark, dir)
    assert(Lineage.sourcesOf(df, "brand") == Set("part" -> "p_brand"))
    assert(Lineage.sourcesOf(df, "supplier") == Set("supplier" -> "s_name"))
    assert(Lineage.sourcesOf(df, "revenue") ==
      Set("lineitem" -> "l_extendedprice", "lineitem" -> "l_discount"))
  }

  test("rollup (Expand) keeps per-column lineage through the projections") {
    val df = Core.martRollup(spark, dir)
    assert(Lineage.sourcesOf(df, "month") == Set("orders" -> "o_orderdate"))
    assert(Lineage.sourcesOf(df, "gross") == Set("orders" -> "o_totalprice"))
  }

  test("curation verdict: keep covers the quality/repetition/decontamination/cluster inputs") {
    val df = DedupQ.corpusFilter(spark, dir)
    val keep = Lineage.sourcesOf(df, "keep")
    // every verdict component (quality, repetition, decontamination,
    // near-dup canonicalization) derives from the documents text; the
    // id threads the joins
    assert(keep.contains("documents" -> "text"), keep)
    assert(keep.contains("documents" -> "doc_id"), keep)
    // the per-component columns stay individually attributable
    assert(Lineage.sourcesOf(df, "quality_ok").contains("documents" -> "text"))
    assert(Lineage.sourcesOf(df, "not_repetitive").contains("documents" -> "text"))
    // the decontamination verdict is count(*) over a shingle join — no
    // DIRECT column inputs, but the indirect (row-selection) closure
    // must surface the joined text it depends on
    assert(Lineage.sourcesOf(df, "not_contaminated").isEmpty)
    assert(Lineage.sourcesOf(df, "not_contaminated", includeIndirect = true)
      .contains("documents" -> "text"))
  }

  test("describeLineage emits one row per (out_col, source)") {
    val rows = Lineage.describeLineage(Core.martDailySales(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(rows == Set(
      ("day", "orders", "o_orderdate"),
      ("status", "orders", "o_orderstatus"),
      ("gross", "orders", "o_totalprice"),
      ("customers", "orders", "o_custkey")))
  }

  test("subquery expressions contribute value and indirect lineage") {
    graft.Tables(spark, dir, "orders").createOrReplaceTempView("orders_v")
    graft.Tables(spark, dir, "customer").createOrReplaceTempView("customer_v")
    val df = spark.sql(
      """SELECT c_custkey,
        | (SELECT max(o_totalprice) FROM orders_v) AS mx
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey)""".stripMargin)
    // scalar subquery: the output VALUE comes from the inner plan
    assert(Lineage.sourcesOf(df, "mx") == Set("orders" -> "o_totalprice"))
    // EXISTS filter: row selection — indirect closure carries both sides
    val ind = Lineage.sourcesOf(df, "c_custkey", includeIndirect = true)
    assert(ind.contains("orders" -> "o_custkey"), ind)
    assert(ind.contains("customer" -> "c_custkey"), ind)
  }

  test("catalog (DSv2) reads attribute to the catalog table name") {
    val (cat, ns) = graft.queries.CatalogQ.register(spark, dir)
    val df = spark.sql(
      s"SELECT o_orderkey AS k, o_totalprice AS p FROM $cat.`$ns`.orders")
    assert(Lineage.sourcesOf(df, "k") == Set("orders" -> "o_orderkey"))
    assert(Lineage.sourcesOf(df, "p") == Set("orders" -> "o_totalprice"))
  }

  test("unknown output column is rejected with the available names") {
    val e = intercept[IllegalArgumentException] {
      Lineage.sourcesOf(Core.martDailySales(spark, dir), "nope")
    }
    assert(e.getMessage.contains("day"))
  }
}
