package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class ContractValidatorSpec extends AnyFunSuite with SparkSpec {

  private def envelope(txns: String*): String =
    s"""{"ok": true, "run_id": "r1", "transactions": [${txns.mkString(",")}]}"""

  private val goodTxn =
    """{"event_time": "2024-01-01T00:00:00Z", "txn_id": "t1", "store_id": "SFO-001",
      | "sku": "SKU-APPLE", "quantity": 2, "unit_price_cents": 199,
      | "tender_type": "cash", "customer_id": null}""".stripMargin

  test("valid payload produces zero violations") {
    val txns = ContractValidator.parseEnvelope(spark, envelope(goodTxn))
    assert(ContractValidator.violations(txns).count() == 0)
    ContractValidator.assertValid(txns) // must not throw
  }

  test("generated ok payload passes the contract end-to-end") {
    val body = PosGenerator.envelopeJson(spark, "run-cv", "ok")
    val txns = ContractValidator.parseEnvelope(spark, body)
    assert(txns.count() == 40)
    ContractValidator.assertValid(txns)
  }

  test("drifted payload still passes — unit_price_cents is optional (the contract gap)") {
    // grocery_validate_dag.py:33: unit_price_cents typed but NOT required;
    // the schema_drift scenario sails through validation and fails later.
    val body = PosGenerator.envelopeJson(spark, "run-gap", "schema_drift")
    ContractValidator.assertValid(ContractValidator.parseEnvelope(spark, body))
  }

  test("missing required field and wrong type are both violations, sorted by path") {
    val noTxnId =
      """{"event_time": "2024-01-01T00:00:00Z", "store_id": "SFO-001",
        | "sku": "SKU-APPLE", "quantity": "two", "tender_type": "cash"}""".stripMargin
    val txns = ContractValidator.parseEnvelope(spark, envelope(goodTxn, noTxnId))
    val v = ContractValidator.violations(txns).collect()
    assert(v.length == 2)
    val paths = v.map(_.getString(1)).toSeq
    assert(paths == paths.sorted)
    assert(paths.exists(_.endsWith("quantity")))
    assert(paths.exists(_.endsWith("txn_id")))
  }

  test("assertValid reports at most 5 violations but the full total") {
    val empties = Seq.fill(3)("{}")
    val txns = ContractValidator.parseEnvelope(spark, envelope(empties: _*))
    val e = intercept[DataContractError] { ContractValidator.assertValid(txns) }
    assert(e.violations.size == 5)
    assert(e.total == 18) // 3 records × 6 required fields
  }

  test("malformed JSON document is a hard stop") {
    val good = PosGenerator.envelopeJson(spark, "run-mf", "ok")
    val truncated = good.substring(0, good.length / 2)
    intercept[DataContractError] {
      ContractValidator.parseEnvelope(spark, truncated)
    }
  }

  test("schema-version pinning rejects v2 payloads and reports field diff") {
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(StructField("id", StringType), StructField("amount", LongType)))
    val v2 = StructType(Seq(StructField("id", StringType),
      StructField("amount_cents", LongType), StructField("currency", StringType)))
    ContractValidator.assertSchemaVersion(v1, v1, 1, 1) // ok
    intercept[DataContractError] {
      ContractValidator.assertSchemaVersion(v2, v1, 2, 1) // version mismatch
    }
    val e = intercept[DataContractError] {
      ContractValidator.assertSchemaVersion(v2, v1, 1, 1) // field drift
    }
    assert(e.getMessage.contains("amount"))
  }
}
