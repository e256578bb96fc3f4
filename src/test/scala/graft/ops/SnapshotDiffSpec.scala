package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** SnapshotDiff contract: added/removed/changed classification,
  * unchanged rows omitted, null-safe column comparison (NULL→value and
  * value→NULL are changes, NULL→NULL is not).
  */
class SnapshotDiffSpec extends AnyFunSuite with SparkSpec {

  test("classifies drift and omits unchanged rows") {
    import spark.implicits._
    val v1 = Seq(
      (1L, Option(10.0), "A"), // unchanged
      (2L, Option(20.0), "B"), // removed
      (3L, Option(30.0), "C"), // price changes
      (4L, None: Option[Double], "D"), // NULL -> value: changed
      (5L, Option(50.0), "E")  // value -> NULL: changed
    ).toDF("k", "price", "status")
    val v2 = Seq(
      (1L, Option(10.0), "A"),
      (3L, Option(33.0), "C"),
      (4L, Option(40.0), "D"),
      (5L, None: Option[Double], "E"),
      (6L, Option(60.0), "F")  // added
    ).toDF("k", "price", "status")
    val got = SnapshotDiff.diff(v1, v2, Seq("k"), Seq("price", "status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "removed", 3L -> "changed", 4L -> "changed",
      5L -> "changed", 6L -> "added"))
  }

  test("NULL == NULL is unchanged; old/new sides carry the values") {
    import spark.implicits._
    val v1 = Seq((1L, None: Option[Double]), (2L, Option(2.0)))
      .toDF("k", "price")
    val v2 = Seq((1L, None: Option[Double]), (2L, Option(4.0)))
      .toDF("k", "price")
    val rows = SnapshotDiff.diff(v1, v2, Seq("k"), Seq("price")).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == 2L && r.getString(1) == "changed" &&
      r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0)
  }
}
