package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.GraftCatalog

/** Queries routed through the [[GraftCatalog]] DSv2 catalog — pure
  * `spark.sql` over `catalog.namespace.table` names, proving the engine
  * is SQL-addressable end-to-end (reference: the implicit two-tier
  * layout of grocery_lib/io_utils.py:38-57 + grocery_lib/pg.py:33-60,
  * here surfaced as one catalog). The catalog's `loadTable` delegates to
  * Spark's own ParquetTable, so the scan below carries the same filter
  * pushdown + column pruning a path read gets — PlanSpec pins it.
  */
object CatalogQ {

  /** Register (idempotently) a GraftCatalog whose lake root is the PARENT
    * of `dir`, so the scale-factor directory itself is a namespace and
    * each `<table>.parquet` inside it is a table. The catalog name is
    * derived from the root path: catalog instances are cached per name
    * for the session's lifetime, so a different root needs a different
    * name, while re-registering the same root is a no-op.
    */
  def register(spark: SparkSession, dir: String): (String, String) = {
    val p = new java.io.File(dir).getCanonicalFile
    val root = p.getParent
    val ns = p.getName
    // content digest (64 bits of MD5), not String.hashCode: catalog
    // instances are cached per NAME for the session's lifetime and a
    // name collision between two roots would silently read the wrong
    // lake — 2^-32 birthday risk needs ~2^32 distinct roots to matter
    val name = "graft_" + graft.ops.StageArtifacts.pathIdent(root)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, ns)
  }

  /** Daily order mart computed purely through catalog SQL — no path
    * reads, no temp views; the FROM clause is a catalog identifier.
    */
  def catalogSql(spark: SparkSession, dir: String): DataFrame = {
    val (cat, ns) = register(spark, dir)
    spark.sql(
      s"""SELECT CAST(o_orderdate AS DATE) AS day, o_orderstatus AS status,
         | count(*) AS txns,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
         |FROM $cat.`$ns`.orders
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |GROUP BY 1, 2""".stripMargin)
  }
}
