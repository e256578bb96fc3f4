package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Partitioned table writer with dynamic partition overwrite — the
  * 100 TB form of the reference's run-scoped artifact layout
  * (grocery_lib/io_utils.py:38-57 keeps one directory per run; at scale
  * the same idea is hive-style `day=…/` partitions so reprocessing one
  * day rewrites ONLY that day's directory and readers prune scans on the
  * partition column).
  */
object PartitionedWriter {

  /** Overwrite exactly the partitions present in `df`, leaving all other
    * partitions of the target intact (dynamic partitionOverwriteMode —
    * static mode would truncate the whole table).
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    // per-write option, NOT a session-conf flip: two concurrent writes in
    // one SparkSession must not race on a shared mutable setting
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
