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

  test("temperature mixture keeps exactly each source's hash-ordered prefix") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = SampleQ.temperatureMixture(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    // independent reference: per-source docs in (content-hash, id)
    // order, running token totals in plain Scala
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n"),
        graft.text.TextOps.rollingHash(
          graft.text.TextOps.normalize(col("text"))).as("okey"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val budgets = out.groupBy(_._2).view.mapValues(_.head._5).toMap
    for ((src, budget) <- budgets) {
      val ordered = docs.filter(_._2 == src).sortBy(d => (d._4, d._1))
      var cum = 0L
      val want = ordered.takeWhile { d => cum += d._3; cum <= budget }
        .map(_._1).toSet
      val got = out.filter(_._2 == src).map(_._1).toSet
      assert(got === want, s"source $src selection")
      // and the reported running totals are the true prefix sums
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      val cumById = ordered.map(_._1).zip(cums).toMap
      out.filter(_._2 == src).foreach { o =>
        assert(o._4 === cumById(o._1), s"doc ${o._1} cum")
      }
    }
    // every source with a positive budget participates
    assert(budgets.size >= 10)
  }

  test("temperature budgets follow the √n rule: monotone and flattening") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("source"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("n_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = SampleQ.temperatureMixture(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(4))).distinct.toMap
    val total = docs.values.sum
    // global budget respected: Σ floor(w_s · B) ≤ B
    assert(budgets.values.sum <= total / 4)
    for ((a, ba) <- budgets; (b, bb) <- budgets
         if docs(a).toDouble / docs(b) > 1.01) {
      // bigger source, bigger budget — but compressed below the raw
      // size ratio (that's the temperature: √ flattens the mixture)
      assert(ba >= bb, s"$a vs $b monotone")
      assert(ba.toDouble / bb < docs(a).toDouble / docs(b),
        s"$a vs $b flattening")
    }
  }
}
