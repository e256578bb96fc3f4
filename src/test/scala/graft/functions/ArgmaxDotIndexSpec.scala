package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class ArgmaxDotIndexSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(53)

  /** The exact fold Ann.assignExpr ran before the native swap. */
  private def composedAssign(v: Column, cs: Seq[Seq[Double]]): Column = {
    val clit = typedlit(cs)
    aggregate(
      sequence(lit(0), lit(cs.size - 1)),
      struct(lit(-1).as("c"), lit(Double.NegativeInfinity).as("best")),
      (acc, c) => {
        val d = ArrayDotProduct.ofColumns(v, element_at(clit, c + 1))
        when(d > acc.getField("best"),
          struct(c.as("c"), d.as("best"))).otherwise(acc)
      }).getField("c")
  }

  test("bit-identical to the fold on random unit vectors and tight margins") {
    import spark.implicits._
    val dim = 16
    val n = 37
    val cs = Seq.fill(n)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 400).map { i =>
      if (i % 4 == 0) Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
      else cs(rnd.nextInt(n)).map(_ + rnd.nextDouble() * 1e-6)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val diff = df.select(
      ArgmaxDotIndex.ofColumn(col("v"), cs).as("native"),
      composedAssign(col("v"), cs).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(diff == 0L)
  }

  test("ties keep the earlier cell; degenerate inputs match the fold") {
    import spark.implicits._
    val cs = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Some(Seq[Option[Double]](Some(1.0), Some(0.0)))), // tie 0 vs 1
      (2L, Some(Seq[Option[Double]](Some(0.5), None))),      // null elem
      (3L, Some(Seq[Option[Double]](Some(1.0), Some(0.0), Some(0.0)))), // dim mismatch
      (4L, None) // null VECTOR: fold parity — the initial accumulator
                 // survives (−1), the row must NOT vanish from joins
    ).toDF("id", "v")
    val r = df.orderBy("id")
      .select(ArgmaxDotIndex.ofColumn(col("v"), cs)).collect()
    assert(r(0).getInt(0) == 0)
    assert(r(1).getInt(0) == -1)
    assert(r(2).getInt(0) == -1)
    assert(!r(3).isNullAt(0) && r(3).getInt(0) == -1)
  }
}
