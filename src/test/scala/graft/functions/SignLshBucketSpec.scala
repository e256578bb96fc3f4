package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class SignLshBucketSpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(71)

  /** The exact fold Ann.lshNeighborsPlanes/Dedup.signBuckets ran
    * before the native swap.
    */
  private def composedBucket(v: Column, table: Column,
      tensor: Seq[Seq[Seq[Double]]]): Column = {
    val planeLit = typedlit(tensor)
    val tablePlanes = element_at(planeLit, table + 1)
    aggregate(
      sequence(lit(0), lit(tensor.head.size - 1)), lit(0L),
      (acc, b) => {
        val d = ArrayDotProduct.ofColumns(v, element_at(tablePlanes, b + 1))
        acc.bitwiseOR(when(d >= 0, call_function("shiftleft", lit(1L), b))
          .otherwise(lit(0L)))
      })
  }

  test("bit-identical buckets to the fold across tables, incl. near-zero dots") {
    import spark.implicits._
    val dim = 12
    val tables = 8
    val bits = 20
    val tensor = (0 until tables).map(t => graft.ann.Ann.planes(100L + t, bits, dim))
    val vecs = (0 until 300).map { i =>
      if (i % 5 == 0)
        // orthogonal-ish tiny components: many near-zero dots, so the
        // d >= 0 boundary is exercised
        Seq.fill(dim)(rnd.nextDouble() * 1e-12 - 5e-13)
      else Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v"),
        explode(sequence(lit(0), lit(tables - 1))).as("table"))
    val diff = df.select(
      SignLshBucket.ofColumns(col("v"), col("table"), tensor).as("native"),
      composedBucket(col("v"), col("table"), tensor).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(diff == 0L)
  }

  test("null vector, null element, and length mismatch land in bucket 0") {
    import spark.implicits._
    val tensor = Seq(Seq(Seq(1.0, 1.0), Seq(-1.0, 1.0)))
    val df = Seq(
      (1L, Some(Seq[Option[Double]](Some(1.0), Some(1.0)))),   // bits 0,1 set? d0=2>=0, d1=0>=0 -> 3
      (2L, None),
      (3L, Some(Seq[Option[Double]](Some(1.0), None))),
      (4L, Some(Seq[Option[Double]](Some(1.0), Some(1.0), Some(1.0)))))
      .toDF("id", "v")
      .withColumn("table", lit(0))
    val r = df.orderBy("id")
      .select(SignLshBucket.ofColumns(col("v"), col("table"), tensor)).collect()
    assert(r(0).getLong(0) == 3L)
    assert(r(1).getLong(0) == 0L)
    assert(r(2).getLong(0) == 0L)
    assert(r(3).getLong(0) == 0L)
  }

  test("out-of-range table raises") {
    import spark.implicits._
    val tensor = Seq(Seq(Seq(1.0)))
    val df = Seq((1L, Seq(1.0))).toDF("id", "v").withColumn("table", lit(5))
    val e = intercept[Exception] {
      df.select(SignLshBucket.ofColumns(col("v"), col("table"), tensor)).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("outside the 1-table tensor"))
  }

  test("genuinely negative table raises; only NULL table lands in bucket 0") {
    import spark.implicits._
    val tensor = Seq(Seq(Seq(1.0)))
    // ANSI element_at reads negative indices from the END of the
    // tensor, so aliasing table=-2 to bucket 0 would be a silent
    // semantic divergence for any reuse site — it must raise. Only the
    // internal null sentinel (a null table index) maps to bucket 0.
    val neg = Seq((1L, Seq(1.0))).toDF("id", "v").withColumn("table", lit(-2))
    val e = intercept[Exception] {
      neg.select(SignLshBucket.ofColumns(col("v"), col("table"), tensor)).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("outside the 1-table tensor"))
    val nullTable = Seq((1L, Seq(1.0))).toDF("id", "v")
      .withColumn("table", lit(null).cast("int"))
    val r = nullTable
      .select(SignLshBucket.ofColumns(col("v"), col("table"), tensor)).collect()
    assert(r(0).getLong(0) == 0L)
  }
}
