package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class PqAssignCodesSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(97)

  private def randBooks(m: Int, k: Int, subDim: Int): Seq[Seq[Seq[Double]]] =
    Seq.fill(m)(Seq.fill(k)(Seq.fill(subDim)(rnd.nextDouble() * 2 - 1)))

  /** The exact composed expression Pq.encodeCodesWith ran before the
    * native swap: per subspace a let-bound slice and an
    * aggregate-over-codes argmin fold against codebook literals.
    */
  private def composedCodes(v: Column,
      books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val norms = books.map(_.map(c => c.map(x => x * x).sum))
    def argmin(sv: Column, cs: Seq[Seq[Double]], cn2: Seq[Double]): Column = {
      val clit = typedlit(cs)
      val nlit = typedlit(cn2)
      aggregate(
        sequence(lit(0), lit(cs.size - 1)),
        struct(lit(-1).as("c"), lit(Double.MaxValue).as("best")),
        (acc, c) => {
          val d = element_at(nlit, c + 1) - lit(2.0) *
            ArrayDotProduct.ofColumns(sv, element_at(clit, c + 1))
          when(d < acc.getField("best"), struct(c.as("c"), d.as("best")))
            .otherwise(acc)
        }).getField("c")
    }
    val sub = (size(v) / m).cast("int")
    array((0 until m).map { s =>
      val sliced = slice(v, lit(s) * sub + 1, sub)
      element_at(
        transform(array(sliced), sv => argmin(sv, books(s), norms(s))), 1)
    }: _*)
  }

  test("bit-identical codes to the composed argmin folds on random corpora") {
    import spark.implicits._
    val m = 8
    val k = 16
    val subDim = 4
    val books = randBooks(m, k, subDim)
    // mix of smooth random vectors, near-centroid vectors (tight argmin
    // margins), and vectors landing exact ties via duplicated centroids
    val vecs = (0 until 300).map { i =>
      if (i % 3 == 0) Seq.fill(m * subDim)(rnd.nextDouble() * 4 - 2)
      else {
        val cents = (0 until m).map(s => books(s)(rnd.nextInt(k)))
        cents.flatten.map(_ + rnd.nextDouble() * 1e-3)
      }
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val both = df.select(
      PqAssignCodes.ofColumn(col("v"), books).as("native"),
      composedCodes(col("v"), books).as("ref"))
    assert(both.filter(not(col("native") <=> col("ref"))).count() == 0)
  }

  test("exact ties keep the earlier code, like the fold") {
    import spark.implicits._
    // two identical centroids: code 0 must win over code 1
    val books = Seq(Seq(Seq(1.0, 1.0), Seq(1.0, 1.0), Seq(9.0, 9.0)))
    val df = Seq((1L, Seq(1.0, 1.0))).toDF("id", "v")
    val r = df.select(PqAssignCodes.ofColumn(col("v"), books)).head()
      .getSeq[Int](0)
    assert(r == Seq(0))
  }

  test("null vector -> null row; null element -> -1 for that subspace") {
    import spark.implicits._
    val books = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val df = Seq(
      (1L, Some(Seq[Option[Double]](Some(1.0), Some(0.1), None, Some(1.0)))),
      (2L, None))
      .toDF("id", "v")
    val r = df.orderBy("id")
      .select(PqAssignCodes.ofColumn(col("v"), books)).collect()
    assert(r(0).getSeq[Int](0) == Seq(0, -1))
    assert(r(1).isNullAt(0))
  }

  test("non-divisible and mismatched dims fail loudly") {
    import spark.implicits._
    val books = Seq(Seq(Seq(1.0, 0.0)), Seq(Seq(0.0, 1.0)))
    val odd = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val e1 = intercept[Exception] {
      odd.select(PqAssignCodes.ofColumn(col("v"), books)).collect()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse(""))
      .contains("not divisible"))
    val wrongDim = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))).toDF("id", "v")
    val e2 = intercept[Exception] {
      wrongDim.select(PqAssignCodes.ofColumn(col("v"), books)).collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("mismatched corpus/codebook artifacts"))
  }
}
