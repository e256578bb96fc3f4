package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class SketchQSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("HLL estimate within 5% of exact distinct per group") {
    SketchQ.approxDistinct(spark, dir).collect().foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val est = r.getAs[Long]("estimate").toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"status=${r.getString(0)} exact=$exact est=$est")
    }
  }

  test("approx percentiles within 2% of exact per group") {
    SketchQ.approxPercentiles(spark, dir).collect().foreach { r =>
      for ((e, a) <- Seq(("exact_p50", "approx_p50"), ("exact_p99", "approx_p99"))) {
        val exact = r.getAs[Double](e)
        val approx = r.getAs[Double](a)
        assert(math.abs(approx - exact) / exact < 0.02,
          s"status=${r.getString(0)} $e=$exact $a=$approx")
      }
    }
  }
}
