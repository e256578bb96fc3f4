package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SketchQ
import graft.testkit.SparkSpec

class KmvSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 256

  test("sketch equals the scalar bottom-k of the distinct values") {
    import spark.implicits._
    // adversarial stream: duplicates, clustered values, a late new
    // minimum, and more distinct values than k
    val vs: Seq[Long] = (0L until 600L).map(i => (i * 7919L) % 10007L) ++
      Seq(3L, 3L, 1L, 10006L, 0L)
    val got = vs.toDF("v").repartition(7)
      .agg(Kmv.sketchOf(col("v"), K).as("sk"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("sk")
    val want = vs.distinct.sorted.take(K)
    assert(got === want)
  }

  test("small sets: the sketch IS the sorted distinct set") {
    import spark.implicits._
    val vs = Seq(5L, 9L, 5L, 2L, 2L, 7L)
    val got = vs.toDF("v").repartition(3)
      .agg(Kmv.sketchOf(col("v"), K).as("sk"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("sk")
    assert(got === Seq(2L, 5L, 7L, 9L))
  }

  test("merge is partitioning-invariant (bit-identical sketches)") {
    import spark.implicits._
    val vs = (0L until 5000L).map(i => (i * 104729L) % 999983L)
    def sketch(parts: Int): Seq[Long] =
      vs.toDF("v").repartition(parts)
        .agg(Kmv.sketchOf(col("v"), K).as("sk"))
        .collect()(0).getAs[scala.collection.Seq[Long]]("sk").toSeq
    assert(sketch(1) === sketch(13))
    assert(sketch(13) === sketch(32))
  }

  test("per-source estimate within 20% of exact; mean error under 10%") {
    val rows = SketchQ.kmvNdv(spark, dir).collect()
    assert(rows.length >= 10)
    val errs = rows.map { r =>
      val est = r.getAs[Double]("est_ndv")
      val exact = r.getAs[Long]("exact_ndv").toDouble
      assert(r.getAs[Int]("n_sketch") === K, "sketch should be full here")
      math.abs(est - exact) / exact
    }
    assert(errs.max < 0.20, s"max rel err ${errs.max}")
    assert(errs.sum / errs.length < 0.10, s"mean rel err ${errs.sum / errs.length}")
  }

  test("compose twin serves the identical relation from shard sketches") {
    val inline = SketchQ.kmvNdv(spark, dir).collect().toSeq
    val composed = SketchQ.kmvNdvCompose(spark, dir).collect().toSeq
    assert(composed === inline)
  }

  test("overlap matrix: invariants and agreement with exact columns") {
    val rows = SketchQ.kmvOverlap(spark, dir).collect()
    assert(rows.length === 190) // C(20,2) unordered source pairs
    rows.foreach { r =>
      val nUnion = r.getAs[Int]("n_union")
      val nMatch = r.getAs[Long]("n_match")
      assert(nMatch <= nUnion)
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val jacc = r.getAs[Double]("jaccard_est")
      assert(jacc >= 0.0 && jacc <= 1.0)
      // a sketch match implies a true intersection member CAN exist;
      // exact zero intersection forces zero matches (no false overlap:
      // matched hashes are real shared values, not estimates)
      if (r.getAs[Long]("exact_inter") === 0L) assert(nMatch === 0L)
    }
    // the estimator must separate overlapping pairs from disjoint ones:
    // mean estimated jaccard over truly-intersecting pairs strictly
    // above the (all-zero) disjoint mean
    val (inter, disjoint) = rows.partition(_.getAs[Long]("exact_inter") > 0L)
    assert(inter.nonEmpty, "testdata should contain cross-source dups")
    val meanInter = inter.map(_.getAs[Double]("jaccard_est")).sum / inter.length
    val meanDis = disjoint.map(_.getAs[Double]("jaccard_est")).sum / disjoint.length
    assert(meanInter > meanDis)
  }

  test("overlap compose twin serves the identical matrix") {
    val inline = SketchQ.kmvOverlap(spark, dir).collect().toSeq
    val composed = SketchQ.kmvOverlapCompose(spark, dir).collect().toSeq
    assert(composed === inline)
  }

  test("property: any partitioning and merge order yields the scalar bottom-k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 16 // small k so evictions and full-buffer paths are exercised
    val agg = new Kmv.KmvAgg(k)
    for (i <- 1 to 20) {
      val vs = Gen.listOfN(300, Gen.choose(0L, 200L))
        .apply(Gen.Parameters.default, Seed(i.toLong)).get
      val parts = 1 + (i % 7)
      val bufs = vs.grouped((vs.size + parts - 1) / parts)
        .map(g => g.foldLeft(agg.zero)(agg.reduce)).toList
      val rot = bufs.drop(i % bufs.size) ++ bufs.take(i % bufs.size)
      val merged = rot.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq === vs.distinct.sorted.take(k), s"seed $i")
      // idempotence: re-merging an already-included buffer is a no-op
      val dup = agg.merge(merged, bufs.head)
      assert(agg.finish(dup).toSeq === agg.finish(merged).toSeq, s"seed $i dup")
    }
  }

  test("forget: patched shard artifact ≡ full rebuild on the filtered corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, dir, "documents")
    val kept = docs.filter(col("doc_id") % 29 =!= 3)
    // full rebuild reference: shard sketches computed fresh from the
    // filtered corpus via the same projection the artifact writer uses
    val rebuilt = kept
      .select(col("doc_id"), col("source"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 8)
      .select(col("doc_id"), col("source"),
        explode(graft.text.TextOps.shingles(col("toks"), 8)).as("g"))
      .select(col("doc_id"), col("source"),
        graft.functions.RollingHash.ofColumn(col("g")).as("h"))
      .groupBy(col("source"), pmod(col("doc_id"), lit(8)).as("shard"))
      .agg(Kmv.sketchOf(col("h"), K).as("sk"))
    val patched = SketchQ.forgetKmvPatchedShards(spark, dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getAs[scala.collection.Seq[Long]]("sk").toSeq))
        .sortBy(t => (t._1, t._2))
    assert(canon(patched) === canon(rebuilt))
    // non-vacuity: the deletion actually changed some shard's sketch
    val full = docs
      .select(col("doc_id"), col("source"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 8)
      .select(col("doc_id"), col("source"),
        explode(graft.text.TextOps.shingles(col("toks"), 8)).as("g"))
      .select(col("doc_id"), col("source"),
        graft.functions.RollingHash.ofColumn(col("g")).as("h"))
      .groupBy(col("source"), pmod(col("doc_id"), lit(8)).as("shard"))
      .agg(Kmv.sketchOf(col("h"), K).as("sk"))
    assert(canon(patched) !== canon(full))
  }

  test("drift: old ⊆ new makes the union sketch the new sketch; novelty tracks exact") {
    val rows = SketchQ.kmvDrift(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_match") <= r.getAs[Int]("n_union"))
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Double]("novelty_est") >= 0.0)
    }
    // the arrival batch really adds content somewhere
    assert(rows.map(_.getAs[Long]("exact_novel")).sum > 0L)
    // estimator is in the right ballpark corpus-wide (k=256 on a ~10%
    // novelty slice: individual sources are noisy, the sum is not)
    val est = rows.map(_.getAs[Double]("novelty_est")).sum
    val exact = rows.map(_.getAs[Long]("exact_novel")).sum.toDouble
    assert(est > exact * 0.5 && est < exact * 2.0, s"est $est vs exact $exact")
  }

  test("handcrafted pair: union sketch, matches and estimates are exact") {
    import spark.implicits._
    // two overlapping sets small enough that sketches are the sets
    val a = (1L to 30L).map(v => ("a", v))
    val b = (21L to 60L).map(v => ("b", v))
    val df = (a ++ b).toDF("source", "v").repartition(5)
    val sk = df.groupBy("source").agg(Kmv.sketchOf(col("v"), K).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Long]]("sk")).toMap
    val union = (sk("a") ++ sk("b")).distinct.sorted.take(K)
    assert(union === (1L to 60L))
    val matches = union.count(v => sk("a").contains(v) && sk("b").contains(v))
    assert(matches === 10) // 21..30
  }
}
