package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** IVF-PQ contract: residual encoding reconstructs μ(cell) + decode(
  * codes) exactly (rnorm differential), the probe's ADC score equals
  * cosine(query, reconstruction) recomputed from scratch, residual PQ
  * beats raw PQ's quantization error at the same (m, k) budget, and the
  * whole path is deterministic.
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val M = 16
  private val K = 32

  private lazy val corpus = graft.Tables(spark, dir, "embeddings")
  private lazy val centroids =
    Ann.ivfCentroids(corpus, "vec_id", "embedding", nCentroids = 16).cache()
  private lazy val assignments =
    Ann.ivfAssignments(corpus, "vec_id", "embedding", centroids).cache()
  private lazy val means =
    IvfPq.cellMeans(corpus, assignments, "vec_id", "embedding").cache()
  private lazy val codebooks = IvfPq.fitResidualCodebooks(
    corpus, assignments, means, centroids, "vec_id", "embedding",
    m = M, k = K, iterations = 3).cache()
  private lazy val codes = IvfPq.encode(
    corpus, assignments, means, centroids, codebooks,
    "vec_id", "embedding").cache()

  private lazy val vecs = corpus.select(col("vec_id"), col("embedding"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    .toMap
  private lazy val cents = centroids.select(col("cluster"), col("centroid"))
    .orderBy(col("cluster")).collect().map(_.getSeq[Double](1))
  private lazy val meanMap = means.collect()
    .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
  private lazy val books = codebooks.collect()
    .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap

  private def recon(cluster: Int, cs: Seq[Int]): Seq[Double] = {
    val resid = (0 until M).flatMap(s => books((s, cs(s))))
    meanMap(cluster).zip(resid).map { case (a, b) => a + b }
  }

  test("code table: cluster matches the IVF assignment, rnorm == ||recon||") {
    val assignMap = assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = codes.collect()
    assert(rows.length == vecs.size)
    for (r <- rows) {
      val (id, cluster, cs, rnorm) = (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2), r.getDouble(3))
      assert(cluster == assignMap(id))
      assert(cs.size == M && cs.forall(c => c >= 0 && c < K))
      val rec = recon(cluster, cs)
      assert(math.abs(rnorm - math.sqrt(rec.map(x => x * x).sum)) < 1e-9,
        s"id $id")
    }
  }

  test("probe ADC cosine == cosine(query, c + decode) from scratch") {
    val queries = corpus.filter(col("vec_id") < 5)
    val codeMap = codes.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    val got = IvfPq.probe(codes, centroids, means, codebooks, queries,
      "vec_id", "embedding", kNeighbors = 5, nProbe = 4).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (qid, nid, cos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val vq = vecs(qid)
      val (cluster, cs) = codeMap(nid)
      val rec = recon(cluster, cs)
      val expect = rec.zip(vq).map { case (a, b) => a * b }.sum /
        (math.sqrt(rec.map(x => x * x).sum) *
          math.sqrt(vq.map(x => x * x).sum))
      assert(math.abs(cos - expect) < 1e-6, s"($qid, $nid)")
    }
  }

  test("probe only surfaces neighbors from the query's nProbe cells") {
    val queries = corpus.filter(col("vec_id") < 5)
    val codeMap = codes.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = IvfPq.probe(codes, centroids, means, codebooks, queries,
      "vec_id", "embedding", kNeighbors = 5, nProbe = 2).collect()
    // replicate the routing rule: RAW query dot x cell centroids, top 2
    // — the exact rule Ann.probeRoutes uses, so IVF and IVF-PQ probe
    // identical cells
    for ((qid, rows) <- got.groupBy(_.getLong(0))) {
      val vq = vecs(qid)
      val probed = cents.indices
        .map(c => c -> cents(c).zip(vq).map { case (a, b) => a * b }.sum)
        .sortBy { case (c, d) => (-d, c) }.take(2).map(_._1).toSet
      assert(rows.forall(r => probed.contains(codeMap(r.getLong(2)))),
        s"query $qid left its probed cells")
    }
  }

  test("residual PQ reconstructs tighter than raw PQ at the same budget") {
    val rawBooks = Pq.fitCodebooks(corpus, "vec_id", "embedding",
      m = M, k = K, iterations = 3)
    val rawCodes = Pq.encode(corpus, "vec_id", "embedding", rawBooks)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val rb = rawBooks.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codeMap = codes.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    def err(id: Long, rec: Seq[Double]) =
      vecs(id).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
    val (resErr, rawErr) = vecs.keys.foldLeft((0.0, 0.0)) { case ((re, ra), id) =>
      val (cluster, cs) = codeMap(id)
      val rawRec = (0 until M).flatMap(s => rb((s, rawCodes(id)(s))))
      (re + err(id, recon(cluster, cs)), ra + err(id, rawRec))
    }
    assert(resErr < rawErr,
      s"residual MSE $resErr not tighter than raw $rawErr")
  }

  test("deterministic run to run") {
    def run() = IvfPq.probe(codes, centroids, means, codebooks,
      corpus.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(run() == run())
  }
}
