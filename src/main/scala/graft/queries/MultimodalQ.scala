package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
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

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.assetsFromDocuments(spark, Tables(spark, dir, "documents")),
      step = 4)
}
