package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** MMR contract: the distributed-candidates + driver-greedy rerank
  * matches a from-scratch scalar MMR exactly; λ = 1 degenerates to pure
  * relevance order; the run is deterministic; and diversification does
  * real work on this corpus (the selection departs from relevance
  * order).
  */
class MmrSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = graft.Tables(spark, dir, "embeddings")
  private lazy val vecs = emb.select(col("vec_id"), col("embedding"))
    .collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val cands: Seq[(Long, Double)] =
    Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq

  private def scalarMmr(k: Int, lambda: Double): Seq[(Long, Double)] = {
    val relOf = cands.toMap
    var remaining = cands.sortBy { case (id, rel) => (-rel, id) }.map(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (out.size < math.min(k, cands.size)) {
      val (id, score) = remaining.map { id =>
        val red = if (out.isEmpty) 0.0
          else out.map { case (s, _) => cos(vecs(id), vecs(s)) }.max
        (id, lambda * relOf(id) - (1.0 - lambda) * red)
      }.minBy { case (id, s) => (-s, id) }
      out += ((id, score))
      remaining = remaining.filterNot(_ == id)
    }
    out.toSeq
  }

  private def run(k: Int, lambda: Double) =
    Mmr.rerank(spark, emb.sparkSession.createDataFrame(
        emb.sparkSession.sparkContext.parallelize(
          cands.map(c => org.apache.spark.sql.Row(c._1, c._2))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cosine",
            org.apache.spark.sql.types.DoubleType)))),
      emb, "vec_id", "embedding", k, lambda)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq

  test("matches a from-scratch scalar MMR exactly (λ = 0.7)") {
    val expected = scalarMmr(10, 0.7).zipWithIndex.map {
      case ((id, s), i) => (i + 1L, id, cands.toMap.apply(id),
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(run(10, 0.7) == expected)
  }

  test("λ = 1 degenerates to pure relevance order") {
    val got = run(10, 1.0).map(_._2)
    val byRel = cands.sortBy { case (id, rel) => (-rel, id) }
      .take(10).map(_._1)
    assert(got == byRel)
  }

  test("diversification does real work: selection departs from relevance order") {
    val mmr = run(10, 0.7).map(_._2)
    val byRel = cands.sortBy { case (id, rel) => (-rel, id) }
      .take(10).map(_._1)
    assert(mmr != byRel, "λ=0.7 should reorder on this corpus")
  }

  test("deterministic run to run") {
    assert(run(10, 0.7) == run(10, 0.7))
  }
}
