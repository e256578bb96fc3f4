package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single latest right row with
  * `right.ts <= left.ts` within the same partition key (the
  * quotes-to-trades / last-attribution operator Spark has no built-in
  * for).
  *
  * Implementation is the union trick, NOT a range join: tag both sides,
  * union them, and carry the right payload forward with
  * `last(..., ignoreNulls)` over (key, ts, side) ordering — right rows
  * sort before left rows at equal ts, giving inclusive `<=` semantics.
  * One shuffle on the key and one sort, O(|L|+|R|); a range join would
  * explode |L|×|matching window| and a per-left-row subquery would be
  * O(|L|·|R|). This is the shape that survives 100 TB of events.
  */
object AsofJoin {

  /** @param left       probe side (all columns preserved)
    * @param right      reference side
    * @param keyCols    equi-partition columns present on both sides
    * @param tsCol      orderable column present on both sides
    * @param payload    right-side columns to carry (emitted with prefix);
    *                   null when no right row precedes the left row
    * @param tieCol     right-side tie-break for identical (key, ts)
    * @param prefix     prefix for emitted payload columns
    */
  def lastBefore(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      payload: Seq[String], tieCol: String,
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tieCol).dataType))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(c => right.schema(c).copy(name = c)))))
    // ONE struct per right row (never null even if its fields are), so
    // last(ignoreNulls) always takes every payload field from the SAME
    // right row — per-column carry could mix rows when a field is null.
    // NULL-key right rows are dropped: SQL join semantics never match on
    // NULL = NULL (a null-key left row still emits, with null payload).
    val r = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keyCols :+ tsCol).map(col) :+
        col(tieCol).as("__tie") :+
        struct(payload.map(col): _*).as("__payload"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__filled", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__filled.$c").as(s"$prefix$c")): _*)
  }
}
