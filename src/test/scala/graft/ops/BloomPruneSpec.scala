package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class BloomPruneSpec extends AnyFunSuite with SparkSpec {

  test("pruned inner join is row-identical to the plain join (long keys)") {
    import spark.implicits._
    val probe = spark.range(0, 10000).select(col("id").as("k"),
      (col("id") * 3).as("payload"))
    // selective build side: 1% of probe keys
    val build = spark.range(0, 10000, 100).select(col("id").as("bk"),
      lit("dim").as("name"))
    val plain = probe.join(build, col("k") === col("bk"))
      .collect().map(_.toSeq).toSet
    val pruned = BloomPrune.prunedInnerJoin(probe, build, "k", "bk",
      expectedItems = 100)
      .collect().map(_.toSeq).toSet
    assert(pruned == plain)
    assert(plain.size == 100)
  }

  test("pruning actually drops non-matching probe rows before the join") {
    val probe = spark.range(0, 100000).toDF("k")
    val build = spark.range(0, 100000, 1000).toDF("bk")
    val kept = BloomPrune.pruneProbe(probe, build, "k", "bk",
      expectedItems = 100, fpp = 0.01).count()
    // 100 true keys + ~1% false positives of 99,900 — far below the full
    // 100k (the shuffle-byte win); exact join correctness is test 1
    assert(kept >= 100 && kept < 5000, s"kept=$kept")
  }

  test("string keys probe the same filter the build side wrote") {
    import spark.implicits._
    val probe = (1 to 1000).map(i => s"user-$i").toDF("k")
    val build = (1 to 1000 by 50).map(i => s"user-$i").toDF("bk")
    val plain = probe.join(build, col("k") === col("bk"))
      .collect().map(_.getString(0)).toSet
    val pruned = BloomPrune.prunedInnerJoin(probe, build, "k", "bk",
      expectedItems = 20)
      .collect().map(_.getString(0)).toSet
    assert(pruned == plain && plain.size == 20)
  }

  test("null probe keys never pass the filter (join would drop them anyway)") {
    import spark.implicits._
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val build = Seq(1L).toDF("bk")
    val kept = BloomPrune.pruneProbe(probe, build, "k", "bk", expectedItems = 10)
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(!kept.contains(null))
    assert(kept.contains(1L))
  }

  test("whole-stage codegen keeps the bloom probe inside the scan stage") {
    val probe = spark.range(0, 1000).toDF("k")
    val build = spark.range(0, 1000, 100).toDF("bk")
    val plan = BloomPrune.pruneProbe(probe, build, "k", "bk", expectedItems = 10)
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators INSIDE a WholeStageCodegen span —
    // the bloom probe must sit in the same codegen'd stage as the scan
    assert(plan.contains("*(1) Filter graft_bloom_might_contain"), plan)
  }
}
