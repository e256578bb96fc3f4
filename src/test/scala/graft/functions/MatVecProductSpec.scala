package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class MatVecProductSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(29)

  /** The exact per-output-dim folds Opq.rotate ran before the swap. */
  private def composedRotate(x: Column, rows: Seq[Seq[Double]]): Column =
    array(rows.map { row =>
      aggregate(zip_with(x, typedlit(row), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v)
    }: _*)

  test("bit-identical to the per-dim folds on a random basis") {
    import spark.implicits._
    val dim = 24
    val rows = Seq.fill(dim)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 200).map(_ => Seq.fill(dim)(rnd.nextDouble() * 4 - 2))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val diff = df.select(
      MatVecProduct.ofColumn(col("x"), rows).as("native"),
      composedRotate(col("x"), rows).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(diff == 0L)
  }

  test("null vector and length mismatch yield a null row") {
    import spark.implicits._
    val rows = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Some(Seq(3.0, 4.0))),
      (2L, None),
      (3L, Some(Seq(1.0, 2.0, 3.0)))).toDF("id", "x")
    val r = df.orderBy("id")
      .select(MatVecProduct.ofColumn(col("x"), rows)).collect()
    assert(r(0).getSeq[Double](0) == Seq(3.0, 4.0))
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))
  }
}
