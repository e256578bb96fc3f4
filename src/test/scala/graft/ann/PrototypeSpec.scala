package graft.ann

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Prototype-classifier contract: means and assignments recomputed from
  * first principles (BigDecimal sums, scalar cosine argmax) must match
  * the distributed confusion matrix exactly; the classifier must beat
  * chance on this labeled corpus (diagonal mass > uniform).
  */
class PrototypeSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("confusion matrix matches a scalar recompute; beats chance") {
    val rows = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def pin(f: Float): BigDecimal =
      BigDecimal(f.toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val byLabel = rows.groupBy(_._3)
    val protos = byLabel.map { case (l, rs) =>
      val dim = rs.head._2.length
      val mean = (0 until dim).map { j =>
        (rs.map(r => pin(r._2(j))).sum).toDouble / rs.size.toDouble
      }.toArray
      l -> mean
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = rows.map { case (_, vf, l) =>
      val v = vf.map(_.toDouble)
      val pred = protos.toSeq.sortBy(_._1).map { case (pl, m) =>
        (pl, cos(v, m))
      }.minBy { case (pl, c) => (-c, pl) }._1
      (l, pred)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Prototype.confusion(
        graft.Tables(spark, dir, "embeddings"), "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // better than chance: diagonal share must exceed 1/nLabels
    val total = got.values.sum.toDouble
    val diag = got.collect { case ((a, b), n) if a == b => n }.sum.toDouble
    assert(diag / total > 1.0 / byLabel.size,
      s"accuracy ${diag / total} not above chance")
  }
}
