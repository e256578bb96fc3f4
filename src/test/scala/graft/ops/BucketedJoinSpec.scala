package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec

/** Bucketing = pre-shuffling at write time: tables bucketed on the join
  * key join WITHOUT a runtime Exchange — at 100 TB this converts the
  * recurring fact⋈fact shuffle into a one-time layout cost. The spec
  * materializes bucketed twins of orders/customer and asserts the join
  * plan has no shuffle on either side.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dropBucketedTables(): Unit = {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // a fresh session's catalog may not know a table left by an earlier
    // JVM, so also remove the managed locations themselves
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("orders_b", "customer_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
  }

  test("bucketed tables join with zero Exchange nodes") {
    dropBucketedTables()
    try {
    Tables(spark, dir, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    // disable broadcast so the planner must choose a bucket-aware
    // sort-merge join (small tables would otherwise broadcast)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      assert(joined.count() ==
        Tables(spark, dir, "orders").join(
          Tables(spark, dir, "customer")
            .select(col("c_custkey").as("o_custkey")), "o_custkey").count())
    }
    } finally dropBucketedTables()
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
