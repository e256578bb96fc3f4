package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.InterleaveBits
import graft.testkit.SparkSpec

class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("interleave: known codes, order preservation incl. negatives") {
    // (0,0): both sign-flipped inputs are 2^31 → bits 62 (a) and 63 (b),
    // then the result sign flip clears bit 63 → exactly 2^62
    val base = InterleaveBits.interleave(0, 0)
    assert(base == 0x4000000000000000L)
    assert(InterleaveBits.interleave(1, 0) == base + 1)
    assert(InterleaveBits.interleave(0, 1) == base + 2)
    assert(InterleaveBits.interleave(1, 1) == base + 3)
    // sign flip keeps SQL ordering: -1 sorts before 0 on each dim
    assert(InterleaveBits.interleave(-1, 0) < InterleaveBits.interleave(0, 0))
    assert(InterleaveBits.interleave(0, -5) < InterleaveBits.interleave(0, 3))
  }

  test("z-order bounds BOTH dimensions per partition; linear sort only one") {
    import spark.implicits._
    // 64x64 grid, shuffled input
    val grid = spark.range(4096)
      .select((col("id") % 64).cast("int").as("x"),
        (col("id") / 64).cast("int").as("y"))
      .repartition(7) // scramble
    def avgSpread(df: DataFrame, c: String): Double = {
      val spreads = df
        .withColumn("__p", spark_partition_id())
        .groupBy("__p").agg((max(col(c)) - min(col(c))).as("spread"))
        .collect().map(_.getAs[Int]("spread").toDouble)
      spreads.sum / spreads.length
    }
    val z = ZOrder.cluster(grid, "x", "y", numFiles = 16)
    val linear = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    // linear layout: x tightly bounded, y spans the whole domain
    assert(avgSpread(linear, "x") < 8)
    assert(avgSpread(linear, "y") > 50)
    // z-order: BOTH dimensions bounded well below the 63 max
    val zx = avgSpread(z, "x")
    val zy = avgSpread(z, "y")
    assert(zx < 32, s"x spread $zx")
    assert(zy < 32, s"y spread $zy")
  }

  test("clustering preserves the data exactly") {
    import spark.implicits._
    val df = Seq((3, 9), (1, 2), (-4, 7)).toDF("x", "y")
    val out = ZOrder.cluster(df, "x", "y", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == Set((3, 9), (1, 2), (-4, 7)))
  }
}
