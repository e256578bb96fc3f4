package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deep BPE-trainer measurement main (r16, judge ask #5): train to
  * ≥1,000 merges on a scale dir's distinct-word table and report wall
  * time, distributed rounds, merges-per-pass and the accepted-batch-
  * size distribution. Measured r16 verdict: exact batching is a
  * ~2–2.5× pass-count reduction (NOT ~48× — the first-interference
  * prefix stop binds), so the per-ROUND cost is what matters; the
  * incremental-delta trainer ([[graft.text.Bpe.trainIncremental]])
  * attacks exactly that, and this main measures both under one
  * protocol.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_BPE_MERGES=1000]
  *   [SPARK_GRAFT_BPE_BATCH=48]
  *   [SPARK_GRAFT_BPE_TRAINER=batched|incremental|both]
  *   java ... graft.BenchBpe
  *
  * Emits one JSON line per run: the raw-corpus run always; if the
  * corpus vocabulary exhausts before the target depth, a second run on
  * the table augmented with deterministic LCG pseudo-words (the
  * BpeSpec 200-merge-gate recipe, scaled up) — augmentation changes
  * WHAT is trained, never the trainer.
  */
object BenchBpe {

  /** (metric name, trainer) rows to measure — `SPARK_GRAFT_BPE_TRAINER`
    * picks batched | incremental | both (default both: the r16 per-round
    * cost comparison is the point).
    */
  private def trainers: Seq[(String, (DataFrame, Int, Int) => (DataFrame, Seq[Int]))] =
    sys.env.getOrElse("SPARK_GRAFT_BPE_TRAINER", "both") match {
      case "batched" => Seq("bpe_train_batched" ->
        (graft.text.Bpe.trainBatchedStats(_, _, _)))
      case "incremental" => Seq("bpe_train_incremental" ->
        (graft.text.Bpe.trainIncrementalStats(_, _, _)))
      // r17: the driver-side trainer — zero distributed rounds, so its
      // batch stats are empty by construction ("rounds":0 in the line)
      case "driver" => Seq("bpe_train_driver" ->
        ((df: DataFrame, m: Int, _: Int) =>
          (graft.text.Bpe.trainDriver(df, m), Seq.empty[Int])))
      case "all" => Seq(
        "bpe_train_batched" -> (graft.text.Bpe.trainBatchedStats(_, _, _)),
        "bpe_train_incremental" ->
          (graft.text.Bpe.trainIncrementalStats(_, _, _)),
        "bpe_train_driver" -> ((df: DataFrame, m: Int, _: Int) =>
          (graft.text.Bpe.trainDriver(df, m), Seq.empty[Int])))
      case _ => Seq(
        "bpe_train_batched" -> (graft.text.Bpe.trainBatchedStats(_, _, _)),
        "bpe_train_incremental" ->
          (graft.text.Bpe.trainIncrementalStats(_, _, _)))
    }

  private def measure(spark: SparkSession, metric: String,
      trainer: (DataFrame, Int, Int) => (DataFrame, Seq[Int]),
      label: String, sfDir: String,
      words: DataFrame, merges: Int, maxBatch: Int, nWords: Long,
      augWords: Long): (Long, String) = {
    System.gc()
    val t0 = System.nanoTime()
    val (table, batchSizes) = trainer(words, merges, maxBatch)
    val got = table.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val sizes = batchSizes.sorted
    def pct(p: Double): Int =
      if (sizes.isEmpty) 0 else sizes(((sizes.size - 1) * p).toInt)
    val rounds = batchSizes.size
    val perPass = if (rounds == 0) 0.0 else got.toDouble / rounds
    def f2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    (got,
      s"""{"metric":${Json.str(metric)},"run":${Json.str(label)},""" +
        s""""unit":"sec","value":${f2(wall)},"sf":${Json.str(sfDir)},""" +
        s""""merges":$got,"target":$merges,"max_batch":$maxBatch,""" +
        s""""rounds":$rounds,"merges_per_pass":${f2(perPass)},""" +
        s""""batch_p10":${pct(0.10)},"batch_p50":${pct(0.50)},""" +
        s""""batch_p90":${pct(0.90)},""" +
        s""""batch_min":${sizes.headOption.getOrElse(0)},""" +
        s""""batch_max":${sizes.lastOption.getOrElse(0)},""" +
        s""""distinct_words":$nWords,"augmented_words":$augWords}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
    val maxBatch = sys.env.getOrElse("SPARK_GRAFT_BPE_BATCH", "48").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val words = graft.text.Bpe.wordCounts(
      Tables(spark, sfDir, "documents"), "text")
    val nWords = words.count()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    // deterministic LCG pseudo-words (no RNG state), enough pair
    // diversity to sustain the target depth — BpeSpec's recipe
    val pseudo = (0 until 20000).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L
      val len = 5 + (i % 9)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 26)).toChar
      }
      sb.toString -> (1L + (i % 97))
    }.toMap
    val aug = words.unionByName(pseudo.toSeq.toDF("word", "n"))
      .groupBy("word").agg(sum(col("n")).as("n"))
    // ZIPF variant: same pseudo-words under a Zipf count law
    // (count(rank) = ⌊10⁶ / rank⌋). The uniform small counts above
    // are tie-DENSE (many pairs share a count), and ties truncate
    // the strict-gap prefix to 1 — a realistic Zipfian corpus has
    // few ties near the top, so this run measures the batch-size
    // distribution the production claim actually depends on.
    val zipf = pseudo.keys.toSeq.sorted.zipWithIndex.map {
      case (w, i) => (w, 1000000L / (i + 1))
    }
    val zdf = words.unionByName(zipf.toDF("word", "n"))
      .groupBy("word").agg(sum(col("n")).as("n"))

    for ((metric, trainer) <- trainers) {
      val (corpusDepth, corpusLine) = measure(spark, metric, trainer,
        "corpus", sfDir, words, merges, maxBatch, nWords, 0L)
      lines += corpusLine
      if (corpusDepth < merges) {
        lines += measure(spark, metric, trainer, "augmented", sfDir, aug,
          merges, maxBatch, nWords, pseudo.size.toLong)._2
        lines += measure(spark, metric, trainer, "zipf", sfDir, zdf,
          merges, maxBatch, nWords, zipf.size.toLong)._2
      }
    }
    lines.foreach(println)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        lines.mkString("", "\n", "\n"))
    }
    spark.stop()
  }
}
