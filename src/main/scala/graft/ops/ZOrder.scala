package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.InterleaveBits

/** Z-order data layout: range-partition and sort by the Morton code of
  * two dimensions before writing, so each output file covers a small
  * rectangle of (dim1, dim2) space. A linear sort bounds only its
  * leading column per file; the Z-curve bounds BOTH, which is what lets
  * parquet min/max stats prune scans filtered on either dimension. The
  * write itself is plain parquet — the operator is purely a layout
  * decision, exactly like clustering keys on a 100 TB table.
  */
object ZOrder {

  /** The clustering key for two int dimensions. */
  def zkey(c1: Column, c2: Column): Column = InterleaveBits.ofColumns(c1, c2)

  /** Repartition+sort `df` along the Z-curve of two int columns into
    * `numFiles` range partitions (one file each on write).
    */
  def cluster(df: DataFrame, c1: String, c2: String, numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zkey(col(c1), col(c2)))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
