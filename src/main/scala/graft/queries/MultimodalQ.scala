package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.ops.Barrier.Ops
import graft.multimodal.Multimodal

/** Multimodal queries: documents → fake media assets → decoded features /
  * sampled frames. The byte statistics have exact SQL oracles because the
  * "media" is the UTF-8 text (pure ASCII in the testdata corpus).
  */
object MultimodalQ {

  def features(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.assetsFromDocuments(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** Real header decode: synthesize PNG/JPEG container bytes per
    * document, then recover (fmt, width, height, channels) by PARSING
    * the binary column ([[graft.multimodal.MediaCodec]]) — the oracle
    * recomputes the expected dims from the document metadata, so every
    * row hash-matching proves the parse round-trip.
    */
  def imageDims(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImageDims(
      Multimodal.imageAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** Real MP4 metadata decode: synthesize ISO-BMFF container bytes per
    * document (incl. version-1 boxes, a second audio-like track and
    * planted truncation), then recover (duration_ms, width, height,
    * n_tracks) by WALKING the boxes ([[graft.multimodal.MediaCodec]]).
    * The oracle recomputes the expected metadata from the document
    * table and EXCLUDES the corrupted ids — hash-match proves both the
    * parse round-trip and the quarantine.
    */
  def videoMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVideoMeta(
      Multimodal.videoAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  def audioMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudioMeta(
      Multimodal.audioAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** q_image_phash: full pixel-level decode (CRC verify + inflate +
    * unfilter, [[graft.multimodal.MediaCodec.decodePngPixels]]) of real
    * synthesized PNGs, then a 64-bit dHash over the recovered pixels.
    * The oracle recomputes the hash from the pixel formula directly —
    * a hash match proves the encode→decode round-trip is lossless AND
    * the block-mean/comparison math is right, while the planted
    * truncation + CRC corruption rows prove the quarantine (they are
    * absent from both sides).
    */
  def imagePhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodePhash(
      Multimodal.phashImageAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** q_image_phash_pairs: image near-duplicate pairs — banded pHash
    * candidate generation + exact Hamming verify ≤ 10, the image-modality
    * member of the dedup family (same band/verify shape as MinHash-LSH).
    *
    * The decoded hash frame goes through the [[graft.ops.Barrier]]
    * decode-once barrier before pairing: the band self-join plus the two
    * verify joins consume it up to 4×, and without the barrier each
    * consumer re-runs the full PNG decode (CRC verify + inflate +
    * unfilter per asset) — the one stage that reads the media column
    * must run exactly once. The materialized frame holds 24 bytes per
    * asset, negligible against the decode it saves; on a cluster,
    * `spark.graft.barrier.mode=replicated` (or `reliable`) makes the
    * barrier survive executor loss, and the hash frame is also exactly
    * what [[graft.ops.StageArtifacts]] persists as a parquet stage
    * artifact when the decode should amortize across queries.
    */
  def imagePhashPairs(spark: SparkSession, dir: String): DataFrame =
    Multimodal.phashPairs(
      Multimodal.decodePhash(
        Multimodal.phashImageAssets(spark, Tables(spark, dir, "documents")))
        .toDF().barrierOnce(),
      maxHamming = 10)

  /** q_image_jpeg_phash: the JPEG-modality fingerprint — full baseline
    * JPEG decode (real Huffman + IDCT, [[graft.multimodal.MediaCodec
    * .decodeJpeg]] — color-capable since r14: gray, 4:2:0 and 4:4:4
    * streams all decode to luma) then the same dHash as the PNG path.
    * The all-ones-quant mosaic assets decode EXACTLY, so the oracle
    * replays the hash from the block formula — the codec family's last
    * by-scope quarantine (JPEG pixels) retired to a hash-matched path.
    */
  def imageJpegPhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeJpegPhash(
      Multimodal.jpegImageAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** q_image_jpeg_pairs: JPEG near-duplicate pairs — identical banded
    * pHash candidate/verify machinery as the PNG pairs, over the
    * JPEG-decoded hashes (decode-once barrier for the multi-join).
    */
  def imageJpegPairs(spark: SparkSession, dir: String): DataFrame =
    Multimodal.phashPairs(
      Multimodal.decodeJpegPhash(
        Multimodal.jpegImageAssets(spark, Tables(spark, dir, "documents")))
        .toDF().barrierOnce(),
      maxHamming = 10)

  /** q_audio_ahash: per-document 64-bit audio fingerprint through the
    * REAL codec round-trip (PCM synth → WAV encode → chunk-walk decode
    * → frame-energy delta-sign chain); the oracle recomputes the hash
    * straight from the sample formula, so hash-match proves the audio
    * codec path end-to-end. Truncated assets (doc_id % 89) quarantine.
    */
  def audioAhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAhash(
      Multimodal.ahashAudioAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** q_audio_ahash_pairs: audio near-duplicate pairs — the SAME banded
    * candidate + Hamming-verify machinery as the image pairs
    * ([[graft.multimodal.Multimodal.phashPairs]]), fed the audio
    * fingerprints; the dedup family's audio member. Checkpointed for
    * the same decode-once reason as the image twin.
    */
  def audioAhashPairs(spark: SparkSession, dir: String): DataFrame =
    Multimodal.phashPairs(
      audioAhash(spark, dir).select(col("asset_id"),
        col("ahash_hi").as("phash_hi"), col("ahash_lo").as("phash_lo"))
        .barrierOnce(),
      maxHamming = 10)

  /** q_video_vhash: per-document 64-bit video fingerprint through the
    * REAL codec round-trip (luma-frame synth → MP4 encode → box-walk
    * decode → per-frame energy delta-sign chain); the oracle recomputes
    * the hash straight from the frame-pixel formula, so hash-match
    * proves the video codec path end-to-end. Truncated assets
    * (doc_id % 83) quarantine. Completes the modality matrix: every
    * modality (image/audio/video) now has a content-level fingerprint.
    */
  def videoVhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVhash(
      Multimodal.vhashVideoAssets(spark, Tables(spark, dir, "documents")))
      .toDF()

  /** q_video_vhash_pairs: video near-duplicate pairs — the SAME banded
    * candidate + Hamming-verify machinery as the image and audio pairs
    * ([[graft.multimodal.Multimodal.phashPairs]]), fed the video
    * fingerprints; the dedup family's video member. Checkpointed for
    * the same decode-once reason as the image twin.
    */
  def videoVhashPairs(spark: SparkSession, dir: String): DataFrame =
    Multimodal.phashPairs(
      videoVhash(spark, dir).select(col("asset_id"),
        col("vhash_hi").as("phash_hi"), col("vhash_lo").as("phash_lo"))
        .barrierOnce(),
      maxHamming = 10)

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.assetsFromDocuments(spark, Tables(spark, dir, "documents")),
      step = 4)
}
