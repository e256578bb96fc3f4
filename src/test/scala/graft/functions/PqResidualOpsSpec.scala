package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class PqResidualOpsSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(13)
  private val m = 4
  private val k = 8
  private val subDim = 3
  private val dim = m * subDim
  private val cells = 5

  private def randBooks(): Seq[Seq[Seq[Double]]] =
    Seq.fill(m)(Seq.fill(k)(Seq.fill(subDim)(rnd.nextDouble() * 2 - 1)))
  private def randMeans(): Seq[Seq[Double]] =
    Seq.fill(cells)(Seq.fill(dim)(rnd.nextDouble() * 4 - 2))

  test("fused residual codes == subtract-then-assign, fused rnorm == recon dot") {
    import spark.implicits._
    val books = randBooks()
    val means = randMeans()
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 4 - 2), rnd.nextInt(cells))
    }
    val df = rows.toDF("id", "v", "cluster")
    // reference: materialize the residual like the pre-fused encode did,
    // then assign with the (already differential-pinned) PqAssignCodes
    val mlit = typedlit(means)
    val ref = df
      .withColumn("res", zip_with(col("v"),
        element_at(mlit, col("cluster") + 1), (a, b) => a - b))
      .select(col("id"), col("cluster"),
        PqAssignCodes.ofColumn(col("res"), books).as("codes"))
    val fused = df.select(col("id"), col("cluster"),
      PqResidualAssignCodes.ofColumns(col("v"), col("cluster"), means, books)
        .as("codes"))
    assert(fused.join(ref.withColumnRenamed("codes", "ref_codes"), Seq("id", "cluster"))
      .filter(not(col("codes") <=> col("ref_codes"))).count() == 0)
    // rnorm reference: the recon zip_with + flatten + native dot + sqrt
    // shape the pre-fused encode ran
    val bookLit = (0 until m).map(s => typedlit(books(s)))
    val refNorm = fused
      .withColumn("recon", zip_with(
        element_at(mlit, col("cluster") + 1),
        flatten(array((0 until m).map(s =>
          element_at(bookLit(s), element_at(col("codes"), s + 1) + 1)): _*)),
        (a, b) => a + b))
      .withColumn("ref_rnorm", sqrt(
        ArrayDotProduct.ofColumns(col("recon"), col("recon"))))
    val diff = refNorm
      .withColumn("rnorm", PqReconNorm.ofColumns(
        col("cluster"), col("codes"), means, books))
      .filter(not(col("rnorm") <=> col("ref_rnorm"))).count()
    assert(diff == 0L)
  }

  test("degenerate inputs: nulls null the row, bad indices raise") {
    import spark.implicits._
    val books = randBooks()
    val means = randMeans()
    val okVec = Seq.fill(dim)(1.0)
    val r = Seq((1L, Some(okVec), Some(2)), (2L, None, Some(1)),
      (3L, Some(okVec), None))
      .toDF("id", "v", "cluster")
      .orderBy("id")
      .select(PqResidualAssignCodes.ofColumns(col("v"), col("cluster"),
        means, books)).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0) && r(2).isNullAt(0))
    val oob = Seq((1L, okVec, 99)).toDF("id", "v", "cluster")
    val e = intercept[Exception] {
      oob.select(PqResidualAssignCodes.ofColumns(col("v"), col("cluster"),
        means, books)).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("outside the"))
    val badCodes = Seq((1L, 0, Seq(0, 0, 0, 99))).toDF("id", "cluster", "codes")
    val e2 = intercept[Exception] {
      badCodes.select(PqReconNorm.ofColumns(col("cluster"), col("codes"),
        means, books)).collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("outside"))
  }
}
