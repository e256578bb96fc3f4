package graft.queries

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Differential test for the z-score outlier gate: moments recomputed
  * from first principles with exact BigDecimal sums over sf0.001, the
  * same decimal-then-double contract the query and its DuckDB oracle
  * share — the flagged set must match EXACTLY, row for row.
  */
class ProfileSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("outliers matches a from-scratch exact-moment recompute") {
    val rows = graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // the query's decimal pin: value -> DECIMAL(18,6), HALF_UP (a double
    // is never exactly a 6dp midpoint, so the mode is immaterial)
    def pin(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = rows.toSeq.groupBy(_._2).toSeq.flatMap { case (et, rs) =>
      val xs = rs.map(t => pin(t._3))
      val n = xs.size.toDouble
      val mean = (xs.sum).toDouble / n
      val sd = math.sqrt((xs.map(x => x * x).sum).toDouble / n - mean * mean)
      rs.flatMap { case (id, _, v) =>
        val xd = pin(v).toDouble
        val z = (xd - mean) / sd
        if (math.abs(z) > 3.0)
          Some((id, et, xd,
            BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble))
        else None
      }
    }.toSet
    val got = ProfileQ.outliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "the gate must flag real outliers on this data")
  }

  test("degenerate group: constant values flag nothing, not everything") {
    import spark.implicits._
    // a stuck-sensor group (sd = 0) next to a group with one real spike
    val ev = (1L to 50L).map(i => (i, "stuck", 7.5)) ++
      (51L to 100L).map(i => (i, "live", if (i == 100L) 1000.0 else 10.0))
    val got = ProfileQ.outliersOf(
        ev.toDF("event_id", "event_type", "value")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(!got.exists(_._2 == "stuck"),
      "a zero-variance group must produce NO outliers (z would be NaN)")
    assert(got.map(_._1).toSet == Set(100L),
      "the live group's spike must still be flagged")
  }

  test("embedDrift matches a from-scratch exact-decimal recompute") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val emb = graft.Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val dim = emb.head._2.length
    // per-(label, dim) exact sums of the DECIMAL(18,9)-cast elements;
    // Spark casts double->decimal through the SHORTEST decimal repr
    // (Double.toString), so the recompute must too
    def d9(f: Float): JBD =
      new JBD(java.lang.Double.toString(f.toDouble))
        .setScale(9, RoundingMode.HALF_UP)
    val byLabel = emb.groupBy(_._1).map { case (l, vs) =>
      l -> (0 until dim).map(j =>
        vs.map(v => d9(v._2(j))).reduce(_ add _)).toIndexedSeq
    }
    val global = (0 until dim).map(j =>
      byLabel.values.map(_(j)).reduce(_ add _)).toIndexedSeq
    def dot(a: IndexedSeq[JBD], b: IndexedSeq[JBD]): JBD =
      (0 until dim).map(j => a(j).multiply(b(j))).reduce(_ add _)
    val expected = byLabel.map { case (l, s) =>
      val c = dot(s, global).doubleValue() /
        (math.sqrt(dot(s, s).doubleValue()) *
          math.sqrt(dot(global, global).doubleValue()))
      l -> new JBD(java.lang.Double.toString(c))
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    }
    val got = ProfileQ.embedDrift(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == byLabel.size)
    got.foreach { case (l, n, c) =>
      assert(n == emb.count(_._1 == l).toLong)
      assert(c == expected(l), s"label=$l")
    }
    // drift scores are non-degenerate: not every label at the same value
    assert(got.map(_._3).distinct.length > 1)
  }

  test("keySkewOf: planted hot key dominates every skew signal") {
    import spark.implicits._
    // key 0 holds 80 rows; keys 1..20 hold 1 row each → n=100, keys=21
    val rows = (Seq.fill(80)(0L) ++ (1L to 20L)).map(Tuple1(_))
      .toDF("k")
    val r = ProfileQ.keySkewOf(rows, "k").collect().head
    assert(r.getString(0) == "k")
    assert(r.getLong(1) == 100L && r.getLong(2) == 21L)
    assert(r.getLong(3) == 80L) // max_cnt
    assert(r.getDouble(5) == 1.0) // p50 of counts: the long tail of 1s
    assert(r.getDouble(8) == 80.0 / (100.0 / 21.0)) // skew = max/avg
    // top-10 = hot key + nine singletons = 89 of 100 rows
    assert(r.getDouble(9) == 0.89)
  }

  test("keySkewOf: uniform keys report skew exactly 1") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => Tuple1(i % 12)).toDF("k")
    val r = ProfileQ.keySkewOf(rows, "k").collect().head
    assert(r.getLong(1) == 60L && r.getLong(2) == 12L)
    assert(r.getLong(3) == 5L && r.getDouble(8) == 1.0)
    assert(r.getDouble(5) == 5.0 && r.getDouble(6) == 5.0 &&
      r.getDouble(7) == 5.0)
  }
}
