package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Session configs every graft session needs. `nanosAsLong` so that an
    * events table stored as TIMESTAMP(NANOS) — which Spark's parquet reader
    * otherwise rejects — reads as a nanos long; harmless when the physical
    * type is already micros. The loader below dispatches on the actual type.
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // graft's native SQL functions (graft_rolling_hash, …)
    "spark.sql.extensions" -> "graft.GraftExtensions")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** The driver has generated `ts` under two physical layouts across
    * regens: TIMESTAMP(NANOS) (read as a nanos long via `nanosAsLong`)
    * and timestamp[us]. Dispatch on the type actually read so a regen
    * can't break every events-table consumer — batch or streaming.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // nanos-long → microsecond TimestampType. FLOOR division (via
        // pmod), not `div`: `div` truncates toward zero, so a pre-epoch
        // nano timestamp would land 1 µs above DuckDB's floor-based
        // conversion and silently fail every events hash-match oracle.
        df.withColumn("ts",
          expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case TimestampNTZType =>
        // no-TZ micros; session TZ is pinned to UTC so wall-clock == instant.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other; expected nanos " +
            "long, timestamp, or timestamp_ntz")
    }

  /** STREAMING read of the events table: same parquet files, same ts
    * normalization, but through `readStream` (the file stream source
    * needs the schema up front — taken from a batch footer read). The
    * unified-API property this enables is the q_stream_mart contract:
    * one transform definition serves batch and stream.
    */
  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // the file stream source wants a DIRECTORY; select the one table's
    // file(s) out of the scale-factor dir with a glob filter
    normalizeEventsTs(
      spark.readStream.schema(spark.read.parquet(path).schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** STREAMING read of the documents table — the deletion-request
    * stream for the forget sink; same schema-from-footer + glob-filter
    * recipe as [[streamEvents]].
    */
  def streamDocuments(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    spark.readStream.schema(spark.read.parquet(path).schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** STREAMING read of the embeddings table — the query-vector stream
    * for the ANN serving sink; same schema-from-footer + glob-filter
    * recipe as [[streamEvents]] (no column normalization needed).
    */
  def streamEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/embeddings.parquet"
    spark.readStream.schema(spark.read.parquet(path).schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
  }
}
