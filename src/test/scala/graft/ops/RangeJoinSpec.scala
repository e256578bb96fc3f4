package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("points match intervals inclusively, across bins, no duplicates") {
    val points = Seq(
      (1L, "u", 100L), // inside [50, 150]
      (2L, "u", 150L), // inclusive end
      (3L, "u", 50L), // inclusive start
      (4L, "u", 151L), // just outside
      (5L, "v", 100L)) // other key: no interval
      .toDF("event_id", "k", "ts")
    // interval spans many bins at binWidth=10; each pair must match once
    val intervals = Seq(("u", 50L, 150L, "s1"), ("u", 200L, 300L, "s2"))
      .toDF("k", "lo", "hi", "name")
    val out = RangeJoin.pointInInterval(points, intervals,
      keyCols = Seq("k"), tsCol = "ts", startCol = "lo", endCol = "hi",
      binWidth = 10L)
      .select("event_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == out.distinct.length) // binning introduced no dups
    assert(out.toSet == Set((1L, "s1"), (2L, "s1"), (3L, "s1")))
  }

  test("dirty intervals (end < start) are dropped before the explode, not replicated") {
    val points = Seq((1L, "u", 100L)).toDF("event_id", "k", "ts")
    // a swapped LARGE pair: naive sequence() would replicate this row
    // into ~280M bins (auto-descending) and blow the array-length limit
    val intervals = Seq(("u", 1000000000000L, 0L, "dirty"), ("u", 50L, 150L, "ok"))
      .toDF("k", "lo", "hi", "name")
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "lo", "hi", binWidth = 3600L)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(out == Seq("ok")) // dirty interval matches nothing and costs nothing
  }

  test("overlapping intervals each match (point joins all containers)") {
    val points = Seq((1L, "u", 100L)).toDF("event_id", "k", "ts")
    val intervals = Seq(("u", 0L, 200L, "outer"), ("u", 90L, 110L, "inner"))
      .toDF("k", "lo", "hi", "name")
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "lo", "hi", binWidth = 50L)
      .select("name").collect().map(_.getString(0)).toSet
    assert(out == Set("outer", "inner"))
  }
}
