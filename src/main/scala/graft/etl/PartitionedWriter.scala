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
    * static mode would truncate the whole table). `maxRecordsPerFile`
    * (when > 0) caps output file size — the knob compaction uses.
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 0L): Unit = {
    // per-write options, NOT a session-conf flip: two concurrent writes in
    // one SparkSession must not race on a shared mutable setting
    val w = df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
