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
    // least/greatest the bounds: a dirty interval with end < start would
    // otherwise make sequence() DESCEND through every bin between the two
    // values — a swapped large pair explodes into millions of bin rows (or
    // trips the sequence length limit). Ordered bounds keep the expansion
    // at |interval|/binWidth; the ts-between-start-and-end post-filter
    // still drops the dirty interval's rows from the result.
    val lo = least(col(startCol), col(endCol))
    val hi = greatest(col(startCol), col(endCol))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
