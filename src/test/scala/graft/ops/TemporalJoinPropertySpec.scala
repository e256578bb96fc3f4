package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Property-based differential tests: the distributed temporal joins
  * must agree with naive driver-side reference implementations on
  * randomized inputs (keys with collisions, duplicate timestamps,
  * multi-bin intervals, empty sides).
  */
class TemporalJoinPropertySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val genPoints = Gen.listOfN(40, for {
    id <- Gen.choose(0L, 10000L)
    k <- Gen.choose(1, 4)
    ts <- Gen.choose(0L, 100L)
  } yield (id, k, ts))

  private val genIntervals = Gen.listOfN(12, for {
    id <- Gen.choose(0L, 10000L)
    k <- Gen.choose(1, 4)
    lo <- Gen.choose(0L, 90L)
    span <- Gen.choose(0L, 40L)
  } yield (id, k, lo, lo + span))

  test("AsofJoin agrees with a naive reference on 20 random datasets") {
    for (i <- 1 to 20) {
      val pts = genPoints.apply(Gen.Parameters.default, Seed(i.toLong)).get
        .zipWithIndex.map { case ((_, k, ts), idx) => (idx.toLong, k, ts) }
      val rights = genIntervals.apply(Gen.Parameters.default, Seed(1000L + i)).get
        .zipWithIndex.map { case ((_, k, ts, _), idx) => (idx.toLong, k, ts) }
      val left = pts.toDF("lid", "k", "ts")
      val right = rights.toDF("rid", "k", "ts")
      val got = AsofJoin.lastBefore(left, right,
        keyCols = Seq("k"), tsCol = "ts",
        payload = Seq("rid"), tieCol = "rid")
        .collect().map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Long]("asof_rid"))).toMap
      val expected = pts.map { case (lid, k, ts) =>
        lid -> rights.filter(r => r._2 == k && r._3 <= ts)
          .sortBy(r => (r._3, r._1)).lastOption.map(_._1)
      }.toMap
      assert(got == expected, s"seed $i")
    }
  }

  test("RangeJoin agrees with a naive reference on 20 random datasets") {
    for (i <- 1 to 20) {
      val pts = genPoints.apply(Gen.Parameters.default, Seed(i.toLong)).get
        .zipWithIndex.map { case ((_, k, ts), idx) => (idx.toLong, k, ts) }
      val ivs = genIntervals.apply(Gen.Parameters.default, Seed(2000L + i)).get
        .zipWithIndex.map { case ((_, k, lo, hi), idx) => (idx.toLong, k, lo, hi) }
      val points = pts.toDF("pid", "k", "ts")
      val intervals = ivs.toDF("iid", "k", "lo", "hi")
      // deliberately small bin width so intervals span many bins
      val got = RangeJoin.pointInInterval(points, intervals,
        keyCols = Seq("k"), tsCol = "ts", startCol = "lo", endCol = "hi",
        binWidth = 7L)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val expected = for {
        (pid, pk, ts) <- pts
        (iid, ik, lo, hi) <- ivs
        if pk == ik && ts >= lo && ts <= hi
      } yield (pid, iid)
      assert(got.sorted.toSeq == expected.sorted.toSeq, s"seed $i")
    }
  }
}
