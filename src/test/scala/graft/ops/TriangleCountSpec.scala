package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class TriangleCountSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Naive all-triples reference: count unordered vertex triples whose
    * three edges all exist. */
  private def scalarCounts(n: Long,
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val counts = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for (a <- 0L until n; b <- a + 1 until n; c <- b + 1 until n
         if has(a, b) && has(b, c) && has(a, c)) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    (0L until n).map(i => i -> counts(i)).toMap
  }

  private def engineCounts(n: Long,
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (0L until n).toDF("id")
    TriangleCount.perNode(nodes, "id", edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle + pendant + isolated: hand-checked counts") {
    // 0-1-2 triangle, 3 pendant off 0, 4 isolated
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L))
    val got = engineCounts(5, edges)
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("K4: every vertex sits in C(3,2)=3 triangles, each counted once") {
    val edges = for (a <- 0L until 4; b <- a + 1 until 4) yield (a, b)
    val got = engineCounts(4, edges)
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("engine equals the all-triples reference on a hash-derived graph") {
    // deterministic pseudo-random graph: edge (a,b) present when a
    // content-style hash of the pair crosses a density cut
    val n = 24L
    val edges = for {
      a <- 0L until n; b <- a + 1 until n
      if ((a * 2654435761L + b * 40503L) % 97) < 30
    } yield (a, b)
    assert(edges.nonEmpty && edges.size < n * (n - 1) / 2)
    val got = engineCounts(n, edges)
    val want = scalarCounts(n, edges)
    assert(got == want)
    assert(want.values.sum > 0, "fixture must actually contain triangles")
  }

  test("deterministic across runs") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (1L, 3L))
    assert(engineCounts(4, edges) == engineCounts(4, edges))
  }
}
