package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class AdcLookupSumSpec extends AnyFunSuite with SparkSpec {

  test("known value, null handling") {
    import spark.implicits._
    // m=2, k=3: lut = [s0c0 s0c1 s0c2 | s1c0 s1c1 s1c2]
    val lut = Seq(10.0, 20.0, 30.0, 1.0, 2.0, 3.0)
    val df = Seq(
      (Some(Seq[Integer](2, 0)), Some(lut)), // 30 + 1
      (Some(Seq[Integer](0, 2)), Some(lut)), // 10 + 3
      (None, Some(lut)),
      (Some(Seq[Integer](1, null)), Some(lut)))
      .toDF("codes", "lut")
    val r = df.select(
      AdcLookupSum.ofColumns(col("codes"), col("lut"), 3)).collect()
    assert(r(0).getDouble(0) == 31.0)
    assert(r(1).getDouble(0) == 13.0)
    assert(r(2).isNullAt(0))
    assert(r(3).isNullAt(0))
  }

  test("bit-identical to the aggregate fold the ADC probes previously ran") {
    import spark.implicits._
    val m = 8
    val k = 16
    val rnd = new scala.util.Random(41)
    val luts = (0 until 5).map(_ => Seq.fill(m * k)(rnd.nextDouble() * 2 - 1))
    val rows = (0 until 400).map { i =>
      (Seq.fill(m)(rnd.nextInt(k)), luts(i % luts.size))
    }
    val df = rows.toDF("codes", "lut")
    // the exact expression shape Pq.adcTopK/IvfPq.probe used before the
    // native swap — index-order accumulation over s = 0…m−1
    val fold = aggregate(
      sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(col("lut"),
        s * k + element_at(col("codes"), s + 1) + 1))
    val diff = df.select(
      AdcLookupSum.ofColumns(col("codes"), col("lut"), k).as("native"),
      fold.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0L)
  }

  test("mismatched lut length and out-of-range codes fail loudly") {
    import spark.implicits._
    val short = Seq((Seq(1, 0), Seq(1.0, 2.0, 3.0))).toDF("codes", "lut")
    val e1 = intercept[Exception] {
      short.select(AdcLookupSum.ofColumns(col("codes"), col("lut"), 3)).collect()
    }
    assert(e1.getMessage.contains("mismatched codebook artifacts") ||
      e1.getCause != null &&
        e1.getCause.getMessage.contains("mismatched codebook artifacts"))
    val oob = Seq((Seq(3, 0), Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)))
      .toDF("codes", "lut")
    val e2 = intercept[Exception] {
      oob.select(AdcLookupSum.ofColumns(col("codes"), col("lut"), 3)).collect()
    }
    assert(e2.getMessage.contains("outside [0, 3)") ||
      e2.getCause != null && e2.getCause.getMessage.contains("outside [0, 3)"))
  }

  test("registered SQL function works via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_adc_sum(array(1, 0), array(1.0d, 2.0d, 3.0d, 4.0d), 2)")
      .head().getDouble(0)
    assert(r == 5.0) // lut[0*2+1] + lut[1*2+0] = 2 + 3
  }

  test("SQL builder rejects a foldable NULL k with a clear message") {
    // CAST(NULL AS INT) is foldable and IntegerType; unboxing its null
    // eval() to 0 would surface as a misleading "positive k, got 0"
    val e = intercept[Exception] {
      spark.sql("SELECT graft_adc_sum(array(1, 0), array(1.0d, 2.0d), " +
        "CAST(NULL AS INT))").collect()
    }
    def all(t: Throwable): String =
      if (t == null) "" else t.getMessage + all(t.getCause)
    assert(all(e).contains("non-null integer literal"))
  }
}
