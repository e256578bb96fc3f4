package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** From-scratch scalar recompute of the integer contract. */
  private def scalarRanks(n: Long, edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val base = 1000000000L / n
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var pr = (0L until n).map(_ -> base).toMap
    for (_ <- 1 to rounds) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s, d) => inflow(d) += pr(s) / deg(s) }
      pr = (0L until n).map(i =>
        i -> (15L * base / 100L + inflow(i) * 85L / 100L)).toMap
    }
    pr
  }

  private def engineRanks(n: Long, edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val nodes = (0L until n).toDF("vec_id")
    val e = edges.toDF("src", "dst")
    PageRank.ranks(nodes, "vec_id", e, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // a 5-node graph: a 3-cycle (0-1-2, symmetric), a pendant (3 <-> 0),
  // and an isolated node (4)
  private val edges = Seq(
    (0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 0L), (0L, 2L),
    (0L, 3L), (3L, 0L))

  test("engine ranks equal the scalar recompute exactly (integers)") {
    for (rounds <- Seq(1, 2, 3))
      assert(engineRanks(5, edges, rounds) == scalarRanks(5, edges, rounds),
        s"rounds=$rounds")
  }

  test("an isolated node holds exactly the teleport term") {
    val pr = engineRanks(5, edges, 3)
    val base = 1000000000L / 5
    assert(pr(4L) == 15L * base / 100L)
  }

  test("hub outranks pendant outranks isolated") {
    // node 0 has degree 3 (two cycle partners + the pendant), the
    // pendant 3 has degree 1, node 4 has none
    val pr = engineRanks(5, edges, 3)
    assert(pr(0L) > pr(3L), pr.toString)
    assert(pr(3L) > pr(4L), pr.toString)
  }

  test("deterministic run to run") {
    assert(engineRanks(5, edges, 3) == engineRanks(5, edges, 3))
  }

  test("rank mass never exceeds the initial total (floor-division leak only)") {
    val pr = engineRanks(5, edges, 3)
    assert(pr.values.sum <= 1000000000L)
    assert(pr.values.forall(_ > 0L))
  }
}
