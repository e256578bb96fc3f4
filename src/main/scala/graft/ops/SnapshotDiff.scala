package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-version reconciliation: given two snapshots of a keyed table,
  * classify every key as added / removed / changed (unchanged rows are
  * omitted — the output is |drift|, not |table|). The CDC-shaped
  * operator a 100 TB lake needs to audit a rewrite, validate a
  * migration, or derive a changelog between daily snapshots.
  *
  * Scale shape: ONE full-outer join co-partitioned on the key columns —
  * both sides shuffle once on the same key, comparison is a narrow
  * projection. Column comparison is null-safe (`<=>` negation), so a
  * NULL→value transition counts as a change rather than vanishing.
  */
object SnapshotDiff {

  /** Diff `v2` against `v1` on `keyCols`, comparing `compareCols`.
    *
    * @return keyCols ++ (change ∈ added|removed|changed) ++ per compare
    *         column `old_<c>` / `new_<c>` (NULL on the absent side)
    */
  def diff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "diff needs at least one key and one compare column")
    // the internal marker/rename names must not collide with user
    // columns — a compare column literally named "change" (or _l/_r/
    // _r_<c>) would be silently overwritten or made ambiguous
    val reserved = Set("change", "_l", "_r") ++ compareCols.map(c => s"_r_$c")
    val clash = (keyCols ++ compareCols).filter(c =>
      reserved.contains(c) || c.startsWith("_r_"))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with SnapshotDiff's " +
        "internal names (change, _l, _r, _r_<compareCol>)")
    val left = v1.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_l", lit(1))
    val right = v2.select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"_r_$c")): _*)
      .withColumn("_r", lit(1))
    val joined = left.join(right, keyCols, "full_outer")
    val anyChanged = compareCols
      .map(c => !(col(c) <=> col(s"_r_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("_l").isNull, lit("added"))
          .when(col("_r").isNull, lit("removed"))
          .when(anyChanged, lit("changed")))
      .filter(col("change").isNotNull)
      .select((keyCols.map(col) :+ col("change")) ++
        compareCols.flatMap(c =>
          Seq(col(c).as(s"old_$c"), col(s"_r_$c").as(s"new_$c"))): _*)
  }
}
