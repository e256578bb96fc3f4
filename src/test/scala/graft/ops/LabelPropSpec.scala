package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Label-propagation contract: seed clamping, tie→smallest-label,
  * multi-hop reach across rounds, isolated nodes stay unlabeled — plus
  * a from-scratch scalar recompute of the full q_label_prop pipeline
  * (edges included) over the sf0.001 corpus.
  */
class LabelPropSpec extends AnyFunSuite with SparkSpec {

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Int]] =
    df.collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getInt(2)))
    }.toMap

  test("semantics: clamp, tie->min, two-hop reach, isolated stays null") {
    import spark.implicits._
    // 1(seed 0) and 2,7(seed 1); 3..6 unlabeled
    val seeds = Seq(
      1L -> Option(0), 2L -> Option(1), 7L -> Option(1),
      3L -> None, 4L -> None, 5L -> None, 6L -> None
    ).toDF("id", "label")
    val edges = Seq(
      (1L, 2L),           // two seeds adjacent: both must stay clamped
      (1L, 3L), (2L, 3L), // 3 sees {0, 1}: tie -> smallest = 0
      (3L, 4L),           // 4 reachable only at round 2 (via 3)
      (1L, 6L), (2L, 6L), (7L, 6L) // 6 sees {0, 1, 1}: majority 1
    ).toDF("a_id", "b_id")

    val r2 = toMap(LabelProp.propagate(seeds, edges, rounds = 2))
    assert(r2(1L).contains(0) && r2(2L).contains(1) && r2(7L).contains(1),
      "seeds must stay clamped")
    assert(r2(3L).contains(0), "tie must break to the smallest label")
    assert(r2(4L).contains(0), "two-hop node must be reached in round 2")
    assert(r2(6L).contains(1), "majority label must win")
    assert(r2(5L).isEmpty, "isolated node must stay unlabeled")

    // round count honored: one round must NOT reach node 4
    val r1 = toMap(LabelProp.propagate(seeds, edges, rounds = 1))
    assert(r1(4L).isEmpty && r1(3L).contains(0))
    // zero rounds: identity
    val r0 = toMap(LabelProp.propagate(seeds, edges, rounds = 0))
    assert(r0 == Map(1L -> Some(0), 2L -> Some(1), 7L -> Some(1),
      3L -> None, 4L -> None, 5L -> None, 6L -> None))
  }

  test("q_label_prop matches a from-scratch scalar propagation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    // scalar edges: exact cosine >= 0.25 over all pairs
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val edges = for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if cos(rows(i)._2, rows(j)._2) >= 0.25
    } yield (rows(i)._1, rows(j)._1)
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed: Map[Long, Option[Int]] = rows.map { case (id, _, l) =>
      id -> (if (id % 5 == 0) Some(l) else None)
    }.toMap
    var labels = seed
    for (_ <- 1 to 2) {
      val next = labels.map { case (id, cur) =>
        if (seed(id).isDefined) id -> seed(id)
        else {
          val votes = adj.getOrElse(id, Seq.empty)
            .flatMap(labels(_)).groupBy(identity).view.mapValues(_.size)
          if (votes.isEmpty) id -> cur
          else id -> Some(votes.toSeq.sortBy { case (l, n) => (-n, l) }.head._1)
        }
      }
      labels = next
    }
    val expected = rows.map { case (id, _, _) =>
      (id, seed(id).getOrElse(-1), labels(id).getOrElse(-1))
    }.sortBy(_._1).toSeq
    val got = graft.queries.GraphQ.labelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got == expected)
    // the run must do real work: some non-seed nodes labeled, some not
    assert(got.exists(t => t._2 == -1 && t._3 >= 0))
  }
}
