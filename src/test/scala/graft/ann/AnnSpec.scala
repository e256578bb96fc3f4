package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec

class AnnSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bruteForceTopK: exact ranks, no self-matches, k per query") {
    import spark.implicits._
    val vecs = Seq(
      (1, Array(1.0f, 0.0f)),
      (2, Array(0.9f, 0.1f)),
      (3, Array(0.0f, 1.0f)),
      (4, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Int]("neighbor_id")).toSeq == Seq(2, 3, 4))
    assert(r.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("lshNeighbors recall@5 >= 0.75 vs brute force on the testdata") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val lsh = pairs(Ann.lshNeighbors(e, q, "vec_id", "embedding", 5))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.75, s"recall=$recall")
    // every LSH hit must be a genuine corpus vector ranked by true cosine
    assert(lsh.forall { case (qid, nid) => qid < 20 && qid != nid })
  }

  test("multi-probe LSH: 4x fewer tables, recall holds; probing only adds candidates") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val probe = pairs(Ann.lshNeighborsMultiprobe(e, q, "vec_id", "embedding", 5))
    val recall = (brute & probe).size.toDouble / brute.size
    assert(recall >= 0.75, s"multiprobe recall=$recall")
    // superset property on SHARED planes: with the same tensor, the
    // probed candidate set contains the unprobed one, so unprobed hits
    // that survive the exact re-rank can only be displaced by TRUER
    // neighbors — recall is monotone in probeBits
    val d = e.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val tensor = (0 until 8).map(t => Ann.planes(42L + t, 6, d))
    def hits(pb: Int) = pairs(Ann.lshNeighborsPlanes(e, q,
      "vec_id", "embedding", 5, tensor, probeBits = pb))
    val r0 = (brute & hits(0)).size
    val r6 = (brute & hits(6)).size
    assert(r6 >= r0, s"probing lost recall: $r6 < $r0")
  }

  test("ivfNeighbors: recall@5 >= 0.5 probing 4/16 cells; deterministic") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val ivf = pairs(Ann.ivfNeighbors(e, q, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 4))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
    assert(ivf == pairs(Ann.ivfNeighbors(e, q, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 4)))
    // the ADAPTIVE serving point (what SparkEntry's q_ann_ivf actually
    // runs: nlist = ceil(sqrt N), nProbe = ceil(sqrt nlist)) — the
    // scanned fraction shrinks ~N^(-1/4), so recall there is a separate
    // claim from the (16, 4) floor gate above (ADVICE r14): on this
    // corpus (45, 7) scans ~16% of cells and must still clear 0.5
    val nList = graft.queries.AnnQ.ivfNList(e)
    val nProbe = graft.queries.AnnQ.ivfNProbe(nList)
    val adaptive = pairs(Ann.ivfNeighbors(e, q, "vec_id", "embedding", 5,
      nCentroids = nList, nProbe = nProbe))
    val recallAdaptive = (brute & adaptive).size.toDouble / brute.size
    info(s"adaptive ($nList, $nProbe) recall@5 = $recallAdaptive")
    assert(recallAdaptive >= 0.5,
      s"adaptive ($nList, $nProbe) recall=$recallAdaptive")
  }

  test("IVF saved-index probes == fresh-build probes (parquet round-trip)") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // the corpus-adaptive sizing the SparkEntry queries use — fresh and
    // saved must be compared at the SAME (nlist, nProbe) operating point
    val nList = graft.queries.AnnQ.ivfNList(e)
    val nProbe = graft.queries.AnnQ.ivfNProbe(nList)
    val fresh = rows(Ann.ivfNeighbors(e, q, "vec_id", "embedding", 5,
      nCentroids = nList, nProbe = nProbe))
    // build/persist/load the index, then probe without any k-means pass
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.ivfCentroids(e, "vec_id", "embedding", nCentroids = nList)
      .write.mode("overwrite").parquet(s"$tmp/centroids")
    val centroids = spark.read.parquet(s"$tmp/centroids")
    Ann.ivfAssignments(e, "vec_id", "embedding", centroids)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$tmp/assignments")
    val assignments = spark.read.parquet(s"$tmp/assignments")
    val indexed = rows(Ann.ivfProbeIndexed(e, assignments, centroids, q,
      "vec_id", "embedding", 5, nProbe = nProbe))
    assert(indexed == fresh)
    // the SparkEntry probe-only serving query (managed prebuilt
    // artifact) must reproduce the fresh build too
    val probeOnly = rows(graft.queries.AnnQ.ivfTopKProbe(spark, dir))
    assert(probeOnly == fresh)
  }

  test("IVF-ADC quantized probe: deterministic, high recall vs the float probe") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val quant = rows(graft.queries.AnnQ.ivfTopKQuantized(spark, dir))
    // deterministic: integer code dots, stable tie-break
    assert(quant == rows(graft.queries.AnnQ.ivfTopKQuantized(spark, dir)))
    // same cells, quantized in-cell ranking: only corpus-side rounding
    // can move neighbors, so recall vs the float probe stays high
    val float = rows(graft.queries.AnnQ.ivfTopKProbe(spark, dir))
    val pairsQ = quant.map(t => (t._1, t._3))
    val pairsF = float.map(t => (t._1, t._3))
    val recall = (pairsQ & pairsF).size.toDouble / pairsF.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("lshNeighbors is deterministic (seeded planes)") {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 3)
    def run() = Ann.lshNeighbors(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }
}
