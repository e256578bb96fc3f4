package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec

class ArrayDotProductSpec extends AnyFunSuite with SparkSpec {

  test("known value, null handling") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val r = df.select(ArrayDotProduct.ofColumns(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 32.0)
    assert(r(1).isNullAt(0))
  }

  test("bit-identical to the zip_with/aggregate fold on the embeddings corpus") {
    // exclude NativeDotRewrite so the reference side really runs the fold
    // (otherwise this test compares the native expression to itself)
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.NativeDotRewrite")
    try {
      val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
        .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      val fold = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0d), (acc, p) => acc + p)
      val diff = e.select(
        ArrayDotProduct.ofColumns(col("v"), col("v")).as("native"), fold.as("ref"))
        .filter(col("native") =!= col("ref")).count()
      assert(diff == 0L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("registered SQL function works via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0)
    assert(r == 11.0)
  }
}
