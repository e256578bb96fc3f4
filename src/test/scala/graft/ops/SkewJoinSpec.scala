package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.etl.PartitionedWriter
import graft.testkit.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedInner equals the plain inner join on real tables") {
    val orders = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, "o_custkey")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedInner(orders, cust, "o_custkey", salts = 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedInner preserves duplicate-key multiplicity") {
    import spark.implicits._
    val big = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val small = Seq((1, "a"), (1, "b")).toDF("k", "w") // duplicate key
    val plain = big.join(small, Seq("k")).count()
    val salted = SkewJoin.saltedInner(big, small, "k", salts = 4).count()
    assert(plain == 4L && salted == 4L)
  }

  test("overwritePartitions rewrites only the partitions present") {
    import spark.implicits._
    val path = Files.createTempDirectory("pw").toString + "/t"
    val day1 = Seq((1L, "2024-01-01"), (2L, "2024-01-01")).toDF("id", "day")
    val day2 = Seq((3L, "2024-01-02")).toDF("id", "day")
    PartitionedWriter.overwritePartitions(day1.union(day2), path, Seq("day"))
    assert(spark.read.parquet(path).count() == 3)
    // reprocess day2 only: day1 rows must survive
    val day2v2 = Seq((30L, "2024-01-02"), (31L, "2024-01-02")).toDF("id", "day")
    PartitionedWriter.overwritePartitions(day2v2, path, Seq("day"))
    val out = spark.read.parquet(path)
    assert(out.count() == 4)
    assert(out.filter(col("day") === "2024-01-01").count() == 2)
    assert(out.filter(col("day") === "2024-01-02")
      .select("id").collect().map(_.getLong(0)).toSet == Set(30L, 31L))
    // partition pruning reaches the scan
    val plan = out.filter(col("day") === "2024-01-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"))
  }
}
