package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard EXPORT — the deliverable of a training-data pipeline:
  * the curated corpus laid out on the packing tape, cut into
  * fixed-sequence-count shards, written as size-bounded files, with a
  * manifest row per shard a training job consumes to schedule reads.
  *
  * Composition (every stage a previously-oracled operator):
  *  - tokenize + concat-tape packing ([[graft.text.Packing.packSequences]]
  *    — two-phase bucketed prefix sum, no single-partition window);
  *  - shard assignment `shard_id = seq_id div seqsPerShard` — a pure
  *    function of the tape offset, so the export is deterministic and
  *    resumable (a doc's shard never depends on ingestion order);
  *  - sharded parquet write: `partitionBy(shard_id)` for shard-pruned
  *    reads plus `maxRecordsPerFile` so no single file exceeds the
  *    trainer's streaming-friendly bound;
  *  - the MANIFEST aggregated from READING THE FILES BACK, not from the
  *    in-flight frame — the row a consumer trusts must describe what is
  *    actually on disk.
  *
  * The tape order (content rolling hash, id) is the mixing order:
  * ingestion-order-unbiased and asymptotically source-proportional, the
  * same recipe as the stratified sampler; a curriculum schedule swaps in
  * [[graft.queries.SampleQ]]'s stride interleave as the order key with
  * identical plumbing. Token ids here are the engine's oracled regex
  * tokenizer; the BPE encoder ([[graft.text.Bpe.encodeStats]]) drops
  * into the same n_tokens slot when a trained vocabulary exists (its
  * merge loop is engine-seeded, hence rows-only — the manifest math
  * stays identical either way).
  *
  * Scale: the tape prefix sum is O(buckets) driver state; the write
  * shuffles once on shard_id (each shard's files written by one task
  * set); the manifest is a map-side-combinable per-shard aggregate over
  * the files — |shards| rows. Nothing here holds corpus-sized state.
  */
object Export {

  /** Write the sharded export of `docs` under `outDir` and return the
    * manifest read back from the files: one row per shard —
    * (shard_id, n_docs, n_sources, n_tokens, first_seq, last_seq,
    * top_source, top_source_docs), docs attributed to the shard their
    * first token lands in (the concat-and-chunk contract). top_source
    * ties break lexicographically so the manifest is deterministic.
    */
  def exportShards(spark: SparkSession, docs: DataFrame,
      seqLen: Long, seqsPerShard: Long, maxRecordsPerFile: Int,
      outDir: String): DataFrame = {
    writeShards(docs, seqLen, seqsPerShard, maxRecordsPerFile, outDir)
    manifestOf(spark.read.parquet(outDir))
  }

  /** The write half: pack, shard, write size-bounded files. */
  def writeShards(docs: DataFrame, seqLen: Long, seqsPerShard: Long,
      maxRecordsPerFile: Int, outDir: String): Unit = {
    require(seqLen > 0 && seqsPerShard > 0 && maxRecordsPerFile > 0)
    graft.text.Packing.packSequences(docs, "doc_id", "text", seqLen)
      .withColumn("shard_id", expr(s"seq_id div $seqsPerShard"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      // one task set per shard: co-locate before partitionBy so a shard's
      // files come from one writer, not |tasks| tiny fragments
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("tok_offset"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard_id")
      .parquet(outDir)
  }

  /** The manifest aggregate over a written (or read-back) shard frame.
    * Split out so specs can recompute it from the in-flight frame and
    * assert files ≡ plan.
    */
  def manifestOf(shardFrame: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // partition-dir round-trip types shard_id as INT; restore the
    // engine's LONG so the oracle compares BIGINT to BIGINT
    val f = shardFrame.withColumn("shard_id", col("shard_id").cast("long"))
    val perSource = f.groupBy("shard_id", "source").agg(
      count(lit(1)).as("src_docs"),
      sum("n_tokens").as("src_tokens"),
      min("seq_id").as("src_first"),
      max("seq_id").as("src_last"))
    val w = Window.partitionBy("shard_id")
      .orderBy(col("src_docs").desc, col("source"))
    perSource
      .withColumn("rn", row_number().over(w))
      .groupBy("shard_id").agg(
        sum("src_docs").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum("src_tokens").as("n_tokens"),
        min("src_first").as("first_seq"),
        max("src_last").as("last_seq"),
        max(when(col("rn") === 1, col("source"))).as("top_source"),
        max(when(col("rn") === 1, col("src_docs"))).as("top_source_docs"))
  }
}
