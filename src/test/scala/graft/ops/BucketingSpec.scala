package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class BucketingSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed join plans SortMergeJoin with ZERO ShuffleExchange") {
    val (o, c) = Bucketing.bucketedOrdersCustomer(spark, dir)
    val joined = o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
    joined.collect() // force AQE to finalize the plan before reading it
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join, got:\n$plan")
    assert(!plan.contains("Exchange"),
      s"co-located join must not shuffle, got:\n$plan")
  }

  test("bucketed join result equals the plain (shuffled) join exactly") {
    val (o, c) = Bucketing.bucketedOrdersCustomer(spark, dir)
    val bucketed = o.hint("merge")
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getDecimal(2))).toSet
    val plain = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(bucketed.nonEmpty && bucketed == plain)
  }

  test("ensureBucketed builds once per (JVM, dataDir) and reuses") {
    var builds = 0
    val t1 = Bucketing.ensureBucketed(spark, dir, "reuse_probe",
      "o_custkey", 4) {
      builds += 1
      graft.Tables(spark, dir, "orders").select(col("o_custkey"))
    }
    val t2 = Bucketing.ensureBucketed(spark, dir, "reuse_probe",
      "o_custkey", 4) {
      builds += 1
      graft.Tables(spark, dir, "orders").select(col("o_custkey"))
    }
    assert(t1 == t2 && builds == 1)
    assert(spark.table(t1).count() > 0)
  }

  test("ensureBucketed refuses a layout-spec change for a built table") {
    Bucketing.ensureBucketed(spark, dir, "spec_probe", "o_custkey", 4) {
      graft.Tables(spark, dir, "orders").select(col("o_custkey"))
    }
    val e = intercept[IllegalArgumentException] {
      Bucketing.ensureBucketed(spark, dir, "spec_probe", "o_custkey", 8) {
        graft.Tables(spark, dir, "orders").select(col("o_custkey"))
      }
    }
    assert(e.getMessage.contains("already built"))
  }
}
