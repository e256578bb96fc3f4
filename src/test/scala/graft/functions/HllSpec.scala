package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SketchQ
import graft.testkit.SparkSpec

class HllSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Scalar reference: registers recomputed in plain Scala from the
    * raw values, no Spark aggregation involved.
    */
  private def refRegisters(values: Seq[String]): Array[Byte] = {
    val regs = new Array[Byte](Hll.M)
    values.foreach { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val h1 = RollingHash.hash(u)
      val h2 = RollingHash2.hash(u)
      val bucket = (h1 % Hll.M).toInt
      val r = Hll.rank(h2)
      if (r > regs(bucket)) regs(bucket) = r.toByte
    }
    regs
  }

  private def packedEvents = {
    import spark.implicits._
    graft.Tables(spark, dir, "events")
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("string").as("s"))
      .select(col("event_type"), col("s"),
        RollingHash.ofColumn(col("s")).as("h1"),
        RollingHash2.ofColumn(col("s")).as("h2"))
      .withColumn("packed",
        (col("h1") % Hll.M) * (1 << Hll.RankBits) +
          when(expr("h2 * 1073741824L DIV 998244353L") === 0, lit(31))
            .otherwise(lit(31) - length(bin(expr("h2 * 1073741824L DIV 998244353L")))))
  }

  test("SQL-path rank equals Hll.rank for every event hash") {
    val rows = packedEvents
      .select(col("h2"), (col("packed") % (1 << Hll.RankBits)).as("sqlRank"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sqlRank") === Hll.rank(r.getAs[Long]("h2")).toLong,
        s"h2=${r.getAs[Long]("h2")}")
    }
  }

  test("aggregated registers equal the scalar reference per group") {
    val agg = packedEvents.groupBy("event_type")
      .agg(Hll.sketchOf(col("packed")).as("regs"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("regs"))
      .toMap
    val raw = packedEvents.select("event_type", "s").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSeq }
    assert(agg.keySet === raw.keySet && agg.nonEmpty)
    raw.foreach { case (k, vs) =>
      assert(java.util.Arrays.equals(agg(k), refRegisters(vs)), s"group $k")
    }
  }

  test("merge(sketch(A), sketch(B)) == sketch(A ∪ B), and merge laws") {
    val all = packedEvents.select("s", "packed")
    val a = all.where(length(col("s")) % 2 === 0)
    val b = all.where(length(col("s")) % 2 === 1)
    def regsOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(Hll.sketchOf(col("packed"))).head().getAs[Array[Byte]](0)
    val (ra, rb, rall) = (regsOf(a), regsOf(b), regsOf(all))
    assert(java.util.Arrays.equals(Hll.merge(ra, rb), rall))
    // commutative, idempotent
    assert(java.util.Arrays.equals(Hll.merge(rb, ra), rall))
    assert(java.util.Arrays.equals(Hll.merge(rall, rall), rall))
    // the incremental rollup story: persisted partial sketches answer
    // the union without touching rows again
    assert(Hll.result(Hll.merge(ra, rb)) === Hll.result(rall))
  }

  test("estimate within 10% of exact NDV for every group, both sfs") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SketchQ.hllNdv(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val exact = r.getAs[Long]("exact_ndv").toDouble
        val est = r.getAs[Double]("est_ndv")
        assert(math.abs(est - exact) / exact < 0.10,
          s"$d type=${r.getString(0)} exact=$exact est=$est")
      }
    }
  }

  test("compose twin: merged daily artifact sketches == the single-pass result") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val inline = SketchQ.hllNdv(spark, d).collect().toSet
      val composed = SketchQ.hllNdvCompose(spark, d).collect().toSet
      assert(composed === inline, d)
      // the partial artifact is genuinely finer than the served grain
      val stage = graft.ops.StageArtifacts.ensure(d, "hllsketch")(_ => fail(
        "artifact should already be built by the compose run"))
      val partials = spark.read.parquet(s"$stage/hll_daily")
      assert(partials.count() > inline.size, "expected multiple days per type")
    }
  }

  test("result is invariant under repartitioning (merge-order independence)") {
    val base = SketchQ.hllNdv(spark, dir).collect().toSet
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(SketchQ.hllNdv(spark, dir).collect().toSet === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("rollup levels are consistent: per-type rows equal q_hll_ndv, total merges all") {
    val ndv = SketchQ.hllNdv(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toMap
    val rollup = SketchQ.hllRollup(spark, dir).collect()
    // the rolled-up per-type rows must be BIT-identical to the one-pass
    // per-type sketch (register max over day partials == direct sketch)
    val typeRows = rollup.filter(r =>
      r.getString(1) == "ALL" && r.getString(0) != "ALL")
    assert(typeRows.length === ndv.size)
    typeRows.foreach { r =>
      assert(ndv(r.getString(0)) === ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6))), r.getString(0))
    }
    // distinct does NOT roll up: per-day exacts overcount the per-type
    // exact (users repeat across days) — the reason sketch tables exist
    val dayRows = rollup.filter(r =>
      r.getString(1) != "ALL" && r.getString(0) != "ALL")
    val perTypeDaySum = dayRows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(6)).sum).toMap
    assert(ndv.exists { case (t, v) => perTypeDaySum(t) > v._5 })
    // grand total present exactly once
    assert(rollup.count(r =>
      r.getString(0) == "ALL" && r.getString(1) == "ALL") === 1)
  }

  test("graft_rolling_hash2: native equals the HOF fold; SQL registration; null/empty") {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
    val diff = docs.select(
      RollingHash2.ofColumn(col("text")).as("native"),
      aggregate(split(col("text"), ""), lit(0L),
        (acc, c) => (acc * 131 + ascii(c)) % RollingHash2.Mod).as("fold"))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(diff === 0L)
    assert(spark.sql("SELECT graft_rolling_hash2('12345')").as[Long].head() === {
      var h = 0L; "12345".foreach(c => h = (h * 131 + c) % RollingHash2.Mod); h
    })
    val r = Seq(Some(""), None).toDF("s")
      .select(RollingHash2.ofColumn(col("s"))).collect()
    assert(r(0).getLong(0) === 0L)
    assert(r(1).isNullAt(0))
  }
}
