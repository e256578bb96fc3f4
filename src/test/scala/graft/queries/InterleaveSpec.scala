package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Stride-scheduling property: reading the corpus in (frac, source,
  * doc_id) order consumes every source proportionally — after ANY
  * prefix of length L, source s has contributed L·n_s/N within ±2
  * (±1 from the stride bound, +1 for frac ties across sources).
  */
class InterleaveSpec extends AnyFunSuite with SparkSpec {

  test("every prefix of the interleaved order is proportionally mixed") {
    val rows = SampleQ.curriculumInterleave(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val n = rows.length
    val bySource = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource.size >= 2, "corpus must have several sources")
    val ordered = rows.sortBy { case (id, src, _, _, frac) => (frac, src, id) }
    val seen = scala.collection.mutable.Map.empty[String, Int]
    for ((row, i) <- ordered.zipWithIndex) {
      seen(row._2) = seen.getOrElse(row._2, 0) + 1
      val l = i + 1
      for ((src, ns) <- bySource) {
        val expectShare = l.toDouble * ns / n
        val got = seen.getOrElse(src, 0)
        assert(math.abs(got - expectShare) <= 2.0,
          s"prefix $l: source $src contributed $got, expected ≈$expectShare")
      }
    }
    // the frac key itself is consistent: rn/n_source
    for ((_, _, rn, ns, frac) <- rows)
      assert(frac == rn.toDouble / ns.toDouble)
  }

  test("budget select keeps exactly the best-quality prefix that fits") {
    val rows = SampleQ.budgetSelect(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    val total = rows.map(_._2).sum
    val budget = total / 2
    // cum_tokens must be the exact running total in (quality desc, id)
    // order, and selected <=> cum <= budget
    val ordered = rows.sortBy { case (id, _, q, _, _) => (-q, id) }
    var cum = 0L
    for ((id, n, _, cumGot, sel) <- ordered) {
      cum += n
      assert(cumGot == cum, s"doc $id running total")
      assert(sel == (cum <= budget), s"doc $id selection")
    }
    // non-vacuous: some selected, some not
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }
}
