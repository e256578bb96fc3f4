package graft.etl

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** JDBC warehouse boundary against embedded Derby — the closest
  * in-container stand-in for the reference's Postgres (SURVEY.md §2.2
  * K5, §2.1 S5): batched partition-parallel writes, JDBC read-back with
  * filter pushdown, and keyed upsert semantics.
  */
class JdbcSinkSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql) } finally c.close()
  }

  private def readTable(table: String) =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  test("appendBatched writes partition-parallel batches; JDBC read round-trips") {
    exec("CREATE TABLE stg_txns (txn_id VARCHAR(40) NOT NULL, store_id VARCHAR(20), revenue_cents BIGINT)")
    val df = (1 to 500)
      .map(i => (f"t$i%04d", s"S-${i % 3}", i * 100L))
      .toDF("txn_id", "store_id", "revenue_cents")
      .repartition(4)
    JdbcSink.appendBatched(df, url, "stg_txns", batchSize = 64)
    val back = readTable("stg_txns")
    assert(back.count() == 500)
    assert(back.filter("store_id = 'S-0'").count() ==
      (1 to 500).count(_ % 3 == 0))
    // pushdown: the JDBC relation compiles the filter into the scan
    val plan = back.filter("revenue_cents > 40000")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("REVENUE_CENTS"))
  }

  test("upsertBatched: ON CONFLICT DO UPDATE semantics, idempotent re-apply") {
    exec("CREATE TABLE fct (run_id VARCHAR(20) NOT NULL, txn_id VARCHAR(20) NOT NULL, v BIGINT)")
    val base = Seq(("r1", "a", 1L), ("r1", "b", 2L), ("r1", "c", 3L))
      .toDF("run_id", "txn_id", "v")
    JdbcSink.upsertBatched(base, url, "fct", keys = Seq("run_id", "txn_id"))
    val updates = Seq(("r1", "b", 99L), ("r1", "d", 4L))
      .toDF("run_id", "txn_id", "v")
    JdbcSink.upsertBatched(updates, url, "fct", keys = Seq("run_id", "txn_id"))
    JdbcSink.upsertBatched(updates, url, "fct", keys = Seq("run_id", "txn_id"))
    val out = readTable("fct").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("r1", "a") -> 1L, ("r1", "b") -> 99L,
      ("r1", "c") -> 3L, ("r1", "d") -> 4L))
  }

  test("null values bind with real JDBC types (Derby rejects Types.NULL)") {
    exec("CREATE TABLE null_t (id BIGINT NOT NULL, name VARCHAR(20), v DOUBLE)")
    val df = Seq((1L, Option("x"), Option(1.5)), (2L, None, None))
      .toDF("id", "name", "v")
    JdbcSink.appendBatched(df, url, "null_t")
    val back = readTable("null_t").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(back(1L) == (Some("x"), Some(1.5)))
    assert(back(2L) == (None, None))
  }

  test("upsert with duplicate keys in the input keeps exactly one row per key") {
    exec("CREATE TABLE dup_t (k VARCHAR(10) NOT NULL, v BIGINT)")
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    JdbcSink.upsertBatched(df, url, "dup_t", keys = Seq("k"))
    val rows = readTable("dup_t").collect().map(r => r.getString(0))
    assert(rows.sorted.toSeq == Seq("a", "b")) // one survivor per key
  }

  test("failed partition write rolls back its whole batch") {
    exec("CREATE TABLE strict_t (id BIGINT NOT NULL PRIMARY KEY)")
    exec("INSERT INTO strict_t VALUES (5)")
    val df = Seq(1L, 2L, 5L).toDF("id").coalesce(1) // 5 violates the PK
    intercept[Exception] {
      JdbcSink.appendBatched(df, url, "strict_t")
    }
    // the partition's transaction rolled back: 1 and 2 must NOT be there
    assert(readTable("strict_t").collect().map(_.getLong(0)).toSeq == Seq(5L))
  }
}
