package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class FuzzyJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)],
      maxDist: Int) =
    FuzzyJoin.joinByEditDistance(
      left.toDF("id", "name"), right.toDF("id", "name"),
      "id", "name", "id", "name",
      blockKey = n => split(n, " ").getItem(0), maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches within the threshold, rejects beyond it") {
    val got = run(
      Seq(1L -> "blue bolt", 2L -> "red widget"),
      Seq(10L -> "blue bol", // dist 1 to "blue bolt"
        11L -> "blue b", // dist 3
        12L -> "red widget", // dist 0
        13L -> "red widgex"), // dist 1
      maxDist = 1)
    assert(got == Set((1L, 10L, 1L), (2L, 12L, 0L), (2L, 13L, 1L)))
  }

  test("blocking contract: an edit in the blocking token is NOT recalled") {
    // "blXe bolt" is distance 1 from "blue bolt" but its first token
    // differs, so the blocked join never compares them — the documented
    // recall trade every blocked linkage makes
    val got = run(Seq(1L -> "blue bolt"), Seq(10L -> "blXe bolt"), maxDist = 1)
    assert(got.isEmpty)
  }

  test("length band prunes without losing any true match") {
    // dist <= 1 implies |len diff| <= 1: a right name 2 shorter can only
    // match at dist >= 2, so it must not appear at maxDist=1 but must
    // appear at maxDist=2
    val l = Seq(1L -> "green gear")
    val r = Seq(10L -> "green ge") // dist 2
    assert(run(l, r, maxDist = 1).isEmpty)
    assert(run(l, r, maxDist = 2) == Set((1L, 10L, 2L)))
  }

  test("maxDist=0 degenerates to an exact equi-join on the name") {
    val got = run(
      Seq(1L -> "hot gizmo", 2L -> "hot gear"),
      Seq(10L -> "hot gizmo", 11L -> "hot gizmos"),
      maxDist = 0)
    assert(got == Set((1L, 10L, 0L)))
  }

  test("no duplicate pairs from the length-band explode") {
    val got = FuzzyJoin.joinByEditDistance(
      Seq(1L -> "small ring").toDF("id", "name"),
      Seq(10L -> "small ring").toDF("id", "name"),
      "id", "name", "id", "name",
      blockKey = n => split(n, " ").getItem(0), maxDist = 2)
    // one candidate pair -> exactly one output row (left length matches
    // exactly one of the 2d+1 exploded keys)
    assert(got.count() == 1)
  }
}
