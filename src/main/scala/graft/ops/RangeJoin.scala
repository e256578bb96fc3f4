package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: match point rows to interval rows sharing a key
  * with `start <= ts <= end`. Spark plans a naive
  * `ON key AND ts BETWEEN start AND end` as an equi-join on the key
  * with a post-filter — every point meets every interval of its key,
  * which explodes on hot keys. Binning adds the time bin to the join
  * key: intervals replicate once per `binWidth` bin they overlap,
  * points join only their own bin, and each (point, interval) pair can
  * meet in at most one bin (the point's), so no dedup is needed. Bin
  * width trades interval replication against join selectivity.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tsCol: String,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__bin", floor(col(tsCol) / binWidth).cast("long"))
    // drop dirty intervals (end < start) BEFORE the explode: they can
    // match nothing (the ts-between post-filter is unsatisfiable), but
    // sequence() would still replicate them into every bin between the
    // two values — auto-descending when start > stop — so one swapped
    // large pair explodes into millions of bin rows or trips the
    // sequence length limit. Filtering is the only real guard; wrapping
    // the bounds in least/greatest would regenerate the same bin range.
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(
          floor(col(startCol) / binWidth).cast("long"),
          floor(col(endCol) / binWidth).cast("long"))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
