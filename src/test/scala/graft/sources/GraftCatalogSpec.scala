package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** The SQL-addressable catalog surface: lake CTAS + SELECT round-trip,
  * INSERT INTO append, plain CREATE TABLE with a readable-while-empty
  * declared schema, namespace create/list/drop, and the reserved
  * `warehouse` namespace routing INSERT INTO to the keyed DSv2 upsert
  * (redelivery-convergent, same contract as WarehouseDataSourceSpec).
  */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec {

  private val whUrl = "jdbc:derby:memory:graftcat;create=true"

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-cat-root").toFile
    dir.deleteOnExit()
    // one catalog for the whole suite; confs must be set before first use
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", dir.getAbsolutePath)
    spark.conf.set("spark.sql.catalog.gcat.warehouse.url", whUrl)
    spark.conf.set("spark.sql.catalog.gcat.warehouse.keys.wh_cat", "k")
    dir.getAbsolutePath
  }

  private def sql(q: String) = { root; spark.sql(q) }

  private def exec(stmt: String): Unit = {
    val c = DriverManager.getConnection(whUrl)
    try { c.createStatement().execute(stmt) } finally c.close()
  }

  test("CTAS into a lake namespace and SELECT back through catalog SQL") {
    sql("CREATE NAMESPACE gcat.stage")
    sql("CREATE TABLE gcat.stage.nums AS SELECT id, id * 2 AS dbl FROM range(10)")
    assert(sql("SELECT CAST(sum(dbl) AS BIGINT) FROM gcat.stage.nums")
      .head().getLong(0) == 90L)
    // the table is a listed, loadable catalog object, not a path alias
    assert(sql("SHOW TABLES IN gcat.stage").collect()
      .map(_.getString(1)).contains("nums"))
  }

  test("INSERT INTO a lake table appends") {
    sql("CREATE TABLE gcat.stage.app AS SELECT id FROM range(3)")
    sql("INSERT INTO gcat.stage.app SELECT id + 10 FROM range(2)")
    assert(sql("SELECT CAST(id AS BIGINT) AS id FROM gcat.stage.app")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 10L, 11L))
  }

  test("plain CREATE TABLE: empty table reads back with its declared schema") {
    sql("CREATE TABLE gcat.stage.empty (k BIGINT, name STRING)")
    val df = sql("SELECT * FROM gcat.stage.empty")
    assert(df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq ==
      Seq("k" -> "bigint", "name" -> "string"))
    assert(df.count() == 0)
    // first insert then read — the declared schema still governs
    sql("INSERT INTO gcat.stage.empty VALUES (1, 'a')")
    assert(sql("SELECT k, name FROM gcat.stage.empty").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("namespace create / list / drop, and missing-root safety") {
    sql("CREATE NAMESPACE gcat.scratch")
    assert(sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("scratch"))
    sql("DROP NAMESPACE gcat.scratch")
    assert(!sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("scratch"))
    // a catalog pointing at a nonexistent root lists no namespaces
    // instead of throwing FileNotFoundException
    spark.conf.set("spark.sql.catalog.gnone", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnone.root", "/nonexistent/graft-root")
    assert(sql("SHOW NAMESPACES IN gnone").collect().isEmpty)
  }

  test("drop table removes it; re-create after drop works") {
    sql("CREATE TABLE gcat.stage.tmp AS SELECT id FROM range(2)")
    sql("DROP TABLE gcat.stage.tmp")
    intercept[AnalysisException] { sql("SELECT * FROM gcat.stage.tmp").collect() }
    sql("CREATE TABLE gcat.stage.tmp AS SELECT id FROM range(5)")
    assert(sql("SELECT * FROM gcat.stage.tmp").count() == 5)
  }

  test("a lake dir literally named 'warehouse' is not listed twice") {
    // the colliding lake dir arrives out-of-band (CREATE NAMESPACE
    // correctly refuses: the reserved namespace already exists)
    Files.createDirectories(java.nio.file.Paths.get(root, "warehouse"))
    val names = sql("SHOW NAMESPACES IN gcat").collect().map(_.getString(0))
    assert(names.count(_.equalsIgnoreCase("warehouse")) == 1)
  }

  test("INSERT INTO warehouse.<t> runs the keyed upsert and converges") {
    exec("CREATE TABLE wh_cat (k BIGINT NOT NULL, v BIGINT)")
    sql("INSERT INTO gcat.warehouse.wh_cat SELECT id, id FROM range(5)")
    // updated batch, REDELIVERED: keyed upsert must converge, not append
    sql("INSERT INTO gcat.warehouse.wh_cat SELECT id, id * 100 FROM range(2)")
    sql("INSERT INTO gcat.warehouse.wh_cat SELECT id, id * 100 FROM range(2)")
    val out = sql("SELECT k, v FROM gcat.warehouse.wh_cat").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 100L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("warehouse namespace rejects CREATE; unknown warehouse table is NoSuchTable") {
    intercept[Exception] {
      sql("CREATE TABLE gcat.warehouse.nope (k BIGINT) ")
    }
    intercept[AnalysisException] {
      sql("SELECT * FROM gcat.warehouse.does_not_exist").collect()
    }
  }

  test("catalog read prunes columns and pushes filters like a path read") {
    sql("CREATE TABLE gcat.stage.scan AS " +
      "SELECT id, id * 2 AS dbl, CAST(id AS STRING) AS s FROM range(100)")
    val df = sql("SELECT id FROM gcat.stage.scan WHERE id > 90")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
    assert(df.count() == 9)
  }
}
