package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class NativeDotRewriteSpec extends AnyFunSuite with SparkSpec {

  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, p) => acc + p)

  // plan assertions read from parquet: a literal input would be
  // constant-folded to a LocalRelation before we could inspect the plan
  private def corpus = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(transform(col("embedding"), x => x.cast("double")).as("v"))

  test("the declarative fold is rewritten to the native expression") {
    val df = corpus.select(foldDot(col("v"), col("v")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.count() == 500)
  }

  test("null semantics preserved: ragged lengths and null elements -> null") {
    val sqlDf = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, p) -> acc + p) AS d
        |FROM VALUES
        |  (array(1d, 2d), array(3d)),
        |  (array(1d, cast(null as double)), array(3d, 4d)),
        |  (array(1d, 2d), array(3d, 4d))
        |AS t(a, b)""".stripMargin)
    val rows = sqlDf.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 11.0)
  }

  test("non-matching folds are left untouched") {
    // x * x ignores the second array: must NOT become a dot product
    val df = corpus.select(aggregate(zip_with(col("v"), col("v"), (x, _) => x * x),
      lit(0.0d), (acc, p) => acc + p).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("rule can be excluded by config") {
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.NativeDotRewrite")
    try {
      val df = corpus.select(foldDot(col("v"), col("v")).as("d"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }
}
