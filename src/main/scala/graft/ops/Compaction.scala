package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.etl.PartitionedWriter

/** Small-file compaction for partitioned parquet tables — the
  * housekeeping a 100 TB table needs: streaming/incremental writers
  * leave each partition with hundreds of task-sized files, and scan
  * cost degrades with file COUNT (footer reads, task scheduling,
  * row-group fragmentation), not just bytes.
  *
  * `compact` rewrites only the selected partitions (dynamic partition
  * overwrite — untouched partitions keep their files byte-for-byte):
  * rows are shuffled so each partition key co-locates in one task, and
  * `maxRecordsPerFile` splits the output at the target size. Data is
  * preserved exactly; only the file layout changes.
  *
  * The write targets the same path the plan reads, so the selected
  * rows are materialized (localCheckpoint) before the overwrite —
  * Spark otherwise rejects the self-overwrite. That bounds one
  * compaction call's working set to the selected partitions: at scale,
  * compact partition-by-partition via the `partitions` filter (the
  * natural incremental loop — "compact yesterday's partition"), not
  * the whole table in one call.
  */
object Compaction {

  /** Rewrite the partitions matching `partitions` (all when empty) of
    * the table at `path`, targeting `targetRowsPerFile` rows per output
    * file. Returns the number of rows rewritten.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
      targetRowsPerFile: Long,
      partitions: Map[String, Any] = Map.empty): Long = {
    require(partitionCols.nonEmpty, "compaction targets a partitioned table")
    require(targetRowsPerFile > 0)
    val full = spark.read.parquet(path)
    val selected = partitions.foldLeft(full) { case (df, (k, v)) =>
      df.filter(col(k) === v)
    }
    val materialized = selected
      .repartition(partitionCols.map(col): _*)
      .localCheckpoint()
    val rows = materialized.count()
    if (rows > 0)
      PartitionedWriter.overwritePartitions(materialized, path, partitionCols,
        maxRecordsPerFile = targetRowsPerFile)
    org.apache.spark.sql.graft.CheckpointUtils.release(materialized)
    rows
  }
}
