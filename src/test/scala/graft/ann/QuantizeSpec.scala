package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class QuantizeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("int8: max|v| maps to ±127, zero vector to scale 0 without dividing by zero") {
    val df = Seq(
      (1L, Array(1.27f, -1.27f, 0.635f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Quantize.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getLong(3)))
      .toMap
    val (scale1, q1, sat1) = out(1L)
    assert(math.abs(scale1 - 0.01) < 1e-9)
    assert(q1 == "127,-127,64,0") // 63.5 rounds half-up to 64
    assert(sat1 == 2) // both extremes saturate
    assert(out(2L) == ((0.0, "0,0,0,0", 0L)))
  }

  test("quantized brute-force ranking keeps recall@5 >= 0.7 vs float") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val float = pairs(Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val coded = Quantize.codes(e, "vec_id", "embedding")
    val quant = pairs(Ann.bruteForceTopK(coded,
      coded.filter(col("vec_id") < 20), "vec_id", "qv", 5))
    val recall = (float & quant).size.toDouble / float.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("int8 round-trip error is bounded by scale/2 per component") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val (scale, q) = Quantize.int8(col("embedding"))
    val err = e.select(
      array_max(zip_with(
        transform(col("embedding"), _.cast("double")),
        transform(q, _.cast("double")),
        (v, c) => abs(v - c * scale))).as("max_err"),
      scale.as("s"))
      .filter(col("s") > 0)
      .select(max(col("max_err") / col("s"))).head().getDouble(0)
    assert(err <= 0.5 + 1e-9, s"max per-component error $err > scale/2")
  }
}
