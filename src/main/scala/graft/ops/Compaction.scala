package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

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
  * `maxRecordsPerFile` splits the output at the target size. Row data
  * is preserved exactly. Intra-partition CLUSTERING is part of the
  * layout too: pass `sortCols` to re-establish a sort (e.g. the Z-order
  * column from [[ZOrder]]) — the default hash shuffle does NOT preserve
  * an existing row order, and min/max skip-scan pruning would degrade
  * silently without it.
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
      partitions: Map[String, Any] = Map.empty,
      sortCols: Seq[String] = Nil): Long = {
    require(partitionCols.nonEmpty, "compaction targets a partitioned table")
    require(targetRowsPerFile > 0)
    // a filter key that is NOT a partition column would silently rewrite
    // the touched partitions with only the matching rows — data loss
    require(partitions.keySet.subsetOf(partitionCols.toSet),
      s"partition filter keys ${partitions.keySet} must be partition columns $partitionCols")
    val full = spark.read.parquet(path)
    requireCanonicalPartitionDirs(spark, path, full.schema, partitionCols)
    val selected = partitions.foldLeft(full) { case (df, (k, v)) =>
      df.filter(col(k) === v)
    }
    val shuffled = selected.repartition(partitionCols.map(col): _*)
    val materialized =
      (if (sortCols.nonEmpty)
        shuffled.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else shuffled).localCheckpoint()
    try {
      val rows = materialized.count()
      if (rows > 0)
        PartitionedWriter.overwritePartitions(materialized, path, partitionCols,
          maxRecordsPerFile = targetRowsPerFile)
      rows
    } finally
      // even on a failed write: don't pin the partition-sized working set
      org.apache.spark.sql.graft.CheckpointUtils.release(materialized)
  }

  /** Refuse tables whose partition DIRECTORY names don't round-trip
    * through partition-type inference: e.g. an externally-written
    * `hour=00` infers as int 0 and would rewrite under `hour=0`,
    * leaving the old directory in place — every row of that partition
    * would then be returned twice.
    *
    * The precondition only needs DIRECTORY NAMES, so it walks the file
    * listing (driver-side, O(partition count)) instead of scanning the
    * table — a 100 TB table's precondition must not cost two full
    * distinct scans per partition column. Each raw directory value is
    * cast through the inferred partition type and back; a mismatch is
    * exactly a value that would rewrite under a different directory.
    */
  private def requireCanonicalPartitionDirs(spark: SparkSession, path: String,
      inferredSchema: StructType, partitionCols: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rawByCol = partitionCols.map(_ =>
      scala.collection.mutable.Set.empty[String])
    def walk(p: Path, level: Int): Unit =
      if (level < partitionCols.size)
        for (st <- fs.listStatus(p) if st.isDirectory) {
          val name = st.getPath.getName
          name.split("=", 2) match {
            case Array(k, v) if k == partitionCols(level) =>
              rawByCol(level) += unescapePathValue(v)
              walk(st.getPath, level + 1)
            case _ if name.startsWith("_") || name.startsWith(".") =>
              // spark/hadoop metadata (_temporary, _SUCCESS dirs) — skip
            case _ =>
              // a k=v dir with the WRONG key (partitionCols misordered or
              // misspelled) or a non-partition dir: silently skipping
              // would make this guard pass vacuously and let compact()
              // rewrite under an inverted layout — refuse instead
              throw new IllegalArgumentException(
                s"unexpected directory '$name' at partition level " +
                  s"'${partitionCols(level)}' under $p — partitionCols " +
                  s"${partitionCols.mkString("[", ",", "]")} do not match " +
                  s"the table layout")
          }
        }
    walk(root, 0)
    for ((c, i) <- partitionCols.zipWithIndex) {
      val dt = inferredSchema(c).dataType
      // null partitions land in the hive default dir on both read and
      // write — they round-trip by construction
      val raws = rawByCol(i).toSeq.filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
      import spark.implicits._
      val bad = raws.toDF("raw")
        .select(col("raw"), col("raw").cast(dt).cast(StringType).as("canon"))
        .collect()
        .filter(r => r.isNullAt(1) || r.getString(0) != r.getString(1))
        .map(_.getString(0))
      require(bad.isEmpty,
        s"partition column '$c' has directory values ${bad.toSet} that " +
          s"do not round-trip through type inference — compacting would " +
          s"duplicate those partitions; rewrite them canonically first")
    }
  }

  /** Undo hive-style %XX escaping in a partition directory value:
    * consecutive %XX groups decode as one UTF-8 byte sequence (a
    * multi-byte char is several %XX escapes); a '%' not followed by two
    * hex digits stays literal — this guard must produce its own
    * actionable error on weird external layouts, never a parse crash.
    */
  private def unescapePathValue(s: String): String =
    if (!s.contains('%')) s
    else {
      // strict two-HEX-DIGIT check per char (Character.digit rejects the
      // '+'/'-' signs Integer.parseInt would accept), computed once per
      // position; -1 = not an escape
      def esc(i: Int): Int =
        if (s.charAt(i) == '%' && i + 2 < s.length) {
          val h1 = Character.digit(s.charAt(i + 1), 16)
          val h2 = Character.digit(s.charAt(i + 2), 16)
          if (h1 >= 0 && h2 >= 0) h1 * 16 + h2 else -1
        } else -1
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        var b = esc(i)
        if (b >= 0) {
          // consecutive escapes are ONE UTF-8 byte sequence (a
          // multi-byte char is several %XX groups)
          val bytes = new java.io.ByteArrayOutputStream
          while (b >= 0) {
            bytes.write(b); i += 3
            b = if (i < s.length) esc(i) else -1
          }
          sb.append(new String(bytes.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
}
