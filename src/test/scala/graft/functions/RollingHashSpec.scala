package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec
import graft.text.TextOps

class RollingHashSpec extends AnyFunSuite with SparkSpec {

  test("native expression matches the hand-computed fold") {
    import spark.implicits._
    val h = Seq("ab").toDF("s").select(TextOps.rollingHash(col("s")))
      .head().getLong(0)
    assert(h == 3105L) // ((0*31+97)*31+98) % 1e9+7
  }

  test("native expression is differentially equal to the HOF fold on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      TextOps.rollingHash(col("text")).as("native"),
      TextOps.rollingHashFold(col("text")).as("fold"))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(diff == 0L)
  }

  test("null input yields null, empty string yields 0") {
    import spark.implicits._
    val r = Seq(Some(""), None).toDF("s")
      .select(TextOps.rollingHash(col("s"))).collect()
    assert(r(0).getLong(0) == 0L)
    assert(r(1).isNullAt(0))
  }

  test("registered SQL function works via GraftExtensions") {
    assert(spark.sql("SELECT graft_rolling_hash('ab')").head().getLong(0) == 3105L)
  }

  test("codegen path: plan stays in WholeStageCodegen") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.select(TextOps.rollingHash(col("text")))
      .queryExecution.executedPlan
    // the starred Project marks a WholeStageCodegen span containing the
    // expression (an interpreted fallback would render unstarred)
    assert(plan.toString.contains("*(1) Project [graft_rolling_hash"))
  }
}
