package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup first-decade decomposition main (r16, judge ask #6): split
  * q_minhash_lsh / q_incremental_dedup wall time into their pipeline
  * stages so the tier's steep-then-flat scale curve (d1 0.76/0.69 →
  * d2 0.13/0.14) has a MECHANISM on the record, not just a curve.
  *
  * Stages are timed cumulatively with the same public entry points the
  * members use (no private surface duplicated):
  *   minhash_lsh:  index  = signatures + band rows (minhashIndex)
  *                 cand   = index + band-bucket self-join (candidates)
  *                 full   = cand + exact-Jaccard verify join
  *   incremental:  index  = corpus-side minhashIndex
  *                 full   = index + batch probe + verify
  * Stage shares are the successive differences; each stage is the
  * median of SPARK_GRAFT_RUNS (default 3) gc-fenced samples.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> java ... graft.BenchDedupDecomp
  */
object BenchDedupDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Long): (Double, Long) = {
      val samples = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val ws = samples.map(_._1).sorted
      (ws(ws.size / 2), samples.head._2)
    }

    val docs = Tables(spark, sfDir, "documents")

    // ---- q_minhash_lsh stages (cumulative) ----
    val (tIdx, nIdx) = timed {
      graft.dedup.Dedup.minhashIndex(docs, "doc_id", "text").count()
    }
    val (tCand, nCand) = timed {
      val bands = graft.dedup.Dedup.minhashIndex(docs, "doc_id", "text")
      bands.as("x").join(bands.as("y"), Seq("band", "bucket"))
        .filter(col("x.doc") < col("y.doc"))
        .select(col("x.doc").as("a_id"), col("y.doc").as("b_id"))
        .distinct().count()
    }
    val (tFull, nFull) = timed {
      graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text").count()
    }

    // ---- q_incremental_dedup stages (cumulative) ----
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val (tIncIdx, _) = timed {
      graft.dedup.Dedup.minhashIndex(corpus, "doc_id", "text").count()
    }
    val (tIncFull, nInc) = timed {
      val index = graft.dedup.Dedup.minhashIndex(corpus, "doc_id", "text")
      graft.dedup.Dedup.incrementalNearDup(batch, corpus, index,
        "doc_id", "text", n = 3, threshold = 0.8).count()
    }

    def f2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val json =
      s"""{"metric":"dedup_decomp","unit":"sec","sf":${Json.str(sfDir)},""" +
        s""""runs":$runs,"minhash_lsh":{"index":${f2(tIdx)},""" +
        s""""cand_cum":${f2(tCand)},"full":${f2(tFull)},""" +
        s""""cand_share":${f2(tCand - tIdx)},""" +
        s""""verify_share":${f2(tFull - tCand)},""" +
        s""""index_rows":$nIdx,"cand_pairs":$nCand,"out_pairs":$nFull},""" +
        s""""incremental":{"index":${f2(tIncIdx)},"full":${f2(tIncFull)},""" +
        s""""probe_share":${f2(tIncFull - tIncIdx)},"out_pairs":$nInc}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
