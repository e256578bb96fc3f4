package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class PosGeneratorSpec extends AnyFunSuite with SparkSpec {

  test("deterministic per (runId, scenario)") {
    val a = PosGenerator.transactions(spark, "run-1", "ok", 40).collect().toSet
    val b = PosGenerator.transactions(spark, "run-1", "ok", 40).collect().toSet
    val c = PosGenerator.transactions(spark, "run-2", "ok", 40).collect().toSet
    assert(a == b)
    assert(a != c)
  }

  test("row count and field domains match the wire contract") {
    val df = PosGenerator.transactions(spark, "run-dom", "ok", 200)
    assert(df.count() == 200)
    val rows = df.collect()
    assert(rows.forall(r => PosGenerator.stores.contains(r.getAs[String]("store_id"))))
    assert(rows.forall(r => PosGenerator.skus.contains(r.getAs[String]("sku"))))
    assert(rows.forall(r => PosGenerator.tenders.contains(r.getAs[String]("tender_type"))))
    assert(rows.forall { r =>
      val q = r.getAs[Int]("quantity"); q >= 1 && q <= 5
    })
    assert(rows.forall(r =>
      PosGenerator.pricesCents.contains(r.getAs[Int]("unit_price_cents"))))
    // customer_id null with p≈0.4 (app.py:34)
    val nullRate = rows.count(_.getAs[String]("customer_id") == null).toDouble / 200
    assert(nullRate > 0.2 && nullRate < 0.6, s"null rate $nullRate")
  }

  test("generator output still matches the pinned PosFixture (oracle fixture)") {
    import org.apache.spark.sql.functions._
    val got = PosGenerator.transactions(spark, "verify-run", "ok", 200)
      .select(date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss"),
        col("txn_id"), col("store_id"), col("sku"),
        col("quantity"), col("unit_price_cents"))
      .orderBy("txn_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(got == PosFixture.rows,
      "PosGenerator drifted from the pinned fixture — q_grocery_daily_mart's oracle would silently diverge")
  }

  test("schema_drift mutates exactly record 0: unit_price_cents → unit_price") {
    val df = PosGenerator.transactions(spark, "run-d", "schema_drift", 40)
    assert(df.columns.contains("unit_price"))
    val drifted = df.filter("unit_price_cents IS NULL AND unit_price IS NOT NULL")
    assert(drifted.count() == 1)
    assert(df.filter("unit_price_cents IS NOT NULL").count() == 39)
  }

  test("temporal_error throws deterministically per runId") {
    val failing = (1 to 50).map(i => s"run-t$i")
      .find(r => Scenario.draw(r, "temporal_error", "http500") < 0.7).get
    val ok = (1 to 50).map(i => s"run-t$i")
      .find(r => Scenario.draw(r, "temporal_error", "http500") >= 0.7).get
    intercept[RuntimeException] {
      PosGenerator.envelopeJson(spark, failing, "temporal_error")
    }
    // same runId fails again (seeded per request, app.py:15-17) …
    intercept[RuntimeException] {
      PosGenerator.envelopeJson(spark, failing, "temporal_error")
    }
    // … while a luckier runId succeeds
    assert(PosGenerator.envelopeJson(spark, ok, "temporal_error").nonEmpty)
  }

  test("malformed_json truncates the envelope body") {
    val good = PosGenerator.envelopeJson(spark, "run-m", "ok")
    val bad = PosGenerator.envelopeJson(spark, "run-m", "malformed_json")
    assert(bad.length < good.length)
  }
}
