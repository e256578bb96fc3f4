package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. At 100 TB
  * these would be partitioned parquet/iceberg datasets; `spark.read.parquet`
  * on a directory is the same code path, so nothing here changes at scale —
  * pruning/pushdown happen in the scan node, not the loader.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft session needs. `nanosAsLong` because the
    * events table stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects as a timestamp type; we read it as a nanos long and normalize
    * below.
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // graft's native SQL functions (graft_rolling_hash, …)
    "spark.sql.extensions" -> "graft.GraftExtensions")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // nanos-long → microsecond TimestampType (floor; matches DuckDB's
      // nanosecond→micro truncation for post-epoch data).
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
