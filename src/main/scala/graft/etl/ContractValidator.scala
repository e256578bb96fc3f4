package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract validation error carrying the first violations, sorted by path
  * (reference: DataContractError, grocery_validate_dag.py:56-62 — "collect
  * all errors, sort by path, raise with first 5").
  */
final class DataContractError(val violations: Seq[String], val total: Long)
  extends RuntimeException(
    s"contract validation failed with $total violation(s); first ${violations.size}: " +
      violations.mkString("; "))

/** Schema-contract validation operators (reference: JSON Schema Draft
  * 2020-12 applied at ingest, grocery_validate_dag.py:17-62; versioned
  * contract check, validation_schema_drift_dag.py:36-70).
  *
  * Declarative re-expression: the contract is a set of column predicates
  * evaluated in ONE distributed pass producing a violations relation —
  * no per-row driver loop, so the same operator validates 40 rows or 40
  * billion. Hard-stop semantics (raise on any violation) collect only the
  * top-5 ordered violations to the driver.
  */
object ContractValidator {

  /** Wire transaction schema (FIXTURES.md §1; contract at
    * grocery_validate_dag.py:17-41). `unit_price_cents` is intentionally
    * absent from `required` — the contract gap the schema_drift scenario
    * exploits (typed-only, line 33).
    */
  val txnSchema: StructType = StructType(Seq(
    StructField("event_time", StringType),
    StructField("txn_id", StringType),
    StructField("store_id", StringType),
    StructField("sku", StringType),
    StructField("quantity", LongType),
    StructField("unit_price_cents", LongType),
    StructField("tender_type", StringType),
    StructField("customer_id", StringType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("ok", BooleanType),
    StructField("run_id", StringType),
    StructField("transactions", ArrayType(txnSchema))))

  val requiredTxnFields: Seq[String] =
    Seq("event_time", "txn_id", "store_id", "sku", "quantity", "tender_type")

  /** Parse a raw envelope JSON document (the raw/transactions.json
    * artifact) into (pos, txn-struct) rows. A malformed document (the
    * malformed_json / partial_write scenarios) yields a null envelope →
    * DataContractError, matching the reference's JSONDecodeError hard stop
    * (grocery_validate_dag.py:52-54).
    */
  def parseEnvelope(spark: SparkSession, rawJson: String): DataFrame = {
    import spark.implicits._
    val parsed = Seq(rawJson).toDF("raw")
      .select(from_json(col("raw"), envelopeSchema).as("env"))
    // both envelope checks in ONE aggregate pass (a second count() would
    // re-parse the document)
    val flags = parsed.agg(
      sum(when(col("env").isNull || col("env.ok").isNull, 1L).otherwise(0L)),
      sum(when(col("env.ok") === false, 1L).otherwise(0L))).head()
    val bad = flags.getLong(0)
    if (bad > 0)
      throw new DataContractError(Seq("$: malformed JSON envelope"), bad)
    // a well-formed envelope may still signal failure (ok=false) — that is
    // the producer's error channel, not a payload to process
    val notOk = flags.getLong(1)
    if (notOk > 0)
      throw new DataContractError(Seq("$.ok: producer signalled failure (ok=false)"), notOk)
    parsed.select(posexplode(col("env.transactions")).as(Seq("pos", "txn")))
  }

  /** Validate (pos, txn) rows against the contract → violations relation
    * (pos, path, message), ordered by path. Missing required field and
    * type-mismatch both surface as null-after-typed-parse, mirroring the
    * union of the JSON-schema `required` + `type` checks.
    */
  def violations(txns: DataFrame): DataFrame = {
    val checks = requiredTxnFields.map { f =>
      struct(
        concat(lit("$.transactions["), col("pos"), lit("]."), lit(f)).as("path"),
        when(col(s"txn.$f").isNull,
          lit(s"required field missing or wrong type: $f")).as("message"))
    }
    txns.select(col("pos"), explode(array(checks: _*)).as("v"))
      .select(col("pos"), col("v.path").as("path"), col("v.message").as("message"))
      .filter(col("message").isNotNull)
      .orderBy(col("path"))
  }

  /** Hard-stop validation: raise DataContractError with the first
    * `reportFirst` violations (sorted by path) if any exist.
    */
  def assertValid(txns: DataFrame, reportFirst: Int = 5): Unit = {
    val v = violations(txns).cache()
    try {
      val total = v.count()
      if (total > 0) {
        val first = v.orderBy(col("path")).limit(reportFirst)
          .collect().map(r => s"${r.getString(1)}: ${r.getString(2)}").toSeq
        throw new DataContractError(first, total)
      }
    } finally v.unpersist()
  }

  /** Versioned-contract check (reference:
    * validation_schema_drift_dag.py:50-70 — consumer pinned to v1 fails on
    * a v2 payload). Compares the actual schema against the expected one
    * and fails with a field-level diff.
    */
  def assertSchemaVersion(actual: StructType, expected: StructType,
      version: Int, expectedVersion: Int): Unit = {
    if (version != expectedVersion)
      throw new DataContractError(
        Seq(s"$$.schema_version: expected $expectedVersion, got $version"), 1)
    val missing = expected.fieldNames.toSet -- actual.fieldNames.toSet
    val extra = actual.fieldNames.toSet -- expected.fieldNames.toSet
    if (missing.nonEmpty || extra.nonEmpty) {
      val msgs = missing.toSeq.sorted.map(f => s"$$.$f: missing from payload") ++
        extra.toSeq.sorted.map(f => s"$$.$f: unexpected field")
      throw new DataContractError(msgs.take(5), msgs.size.toLong)
    }
  }
}
