package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class CompactionSpec extends AnyFunSuite with SparkSpec {

  private def parquetFiles(path: String): Array[java.io.File] = {
    def walk(f: java.io.File): Array[java.io.File] =
      if (f.isDirectory) f.listFiles().flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Array(f)
      else Array.empty
    walk(new java.io.File(path))
  }

  test("compaction collapses small files per partition, preserves data exactly, leaves other partitions untouched") {
    val path = Files.createTempDirectory("compact").toString + "/t"
    // fragmented write: 16 tasks × 2 day-partitions → ~32 small files
    spark.range(2000)
      .select(col("id"), (col("id") % 2).as("day"))
      .repartition(16)
      .write.partitionBy("day").parquet(path)
    val before = parquetFiles(path)
    assert(before.length >= 20, s"fixture not fragmented: ${before.length}")
    val day1Before = parquetFiles(s"$path/day=1").map(_.getName).toSet

    // compact ONLY day=0
    val rows = Compaction.compact(spark, path, Seq("day"),
      targetRowsPerFile = 10000, partitions = Map("day" -> 0))
    assert(rows == 1000)

    // day=0 collapsed to one file; day=1's files byte-identical (names kept)
    assert(parquetFiles(s"$path/day=0").length == 1)
    assert(parquetFiles(s"$path/day=1").map(_.getName).toSet == day1Before)
    // data preserved exactly
    // hive-style partition values read back as int — normalize for compare
    val got = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Number]("id").longValue(),
        r.getAs[Number]("day").longValue())).toSet
    assert(got == (0L until 2000L).map(i => (i, i % 2)).toSet)
  }

  test("filter keys must be partition columns — a data-column filter would silently lose rows") {
    val path = Files.createTempDirectory("compact3").toString + "/t"
    spark.range(100).select(col("id"), (col("id") % 2).as("day"))
      .write.partitionBy("day").parquet(path)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, path, Seq("day"), 100, partitions = Map("id" -> 3))
    }
    assert(e.getMessage.contains("must be partition columns"))
  }

  test("non-canonical partition directory names are refused, not duplicated") {
    val path = Files.createTempDirectory("compact4").toString + "/t"
    // externally-written zero-padded partitions: day=00 / day=01 infer as
    // int 0/1 and would rewrite under day=0, duplicating the partition
    spark.range(100)
      .select(col("id"), format_string("%02d", col("id") % 2).as("day"))
      .write.partitionBy("day").parquet(path)
    assert(new java.io.File(s"$path/day=00").exists())
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, path, Seq("day"), 100)
    }
    assert(e.getMessage.contains("round-trip"), e.getMessage)
  }

  test("targetRowsPerFile splits an oversized partition into multiple files") {
    val path = Files.createTempDirectory("compact2").toString + "/t"
    spark.range(1000)
      .select(col("id"), lit(0L).as("day"))
      .repartition(8)
      .write.partitionBy("day").parquet(path)
    Compaction.compact(spark, path, Seq("day"), targetRowsPerFile = 300)
    val files = parquetFiles(s"$path/day=0")
    assert(files.length == 4, s"expected ceil(1000/300)=4 files, got ${files.length}") // 300+300+300+100
    assert(spark.read.parquet(path).count() == 1000)
  }
}
