package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque media bytes + typed metadata. At 100 TB the
  * `media` column is the dominant storage cost — parquet keeps it as a
  * binary column with per-page compression, and column pruning means
  * metadata-only queries never read the bytes.
  */
final case class MediaAsset(
    asset_id: Long,
    modality: String, // image | video | audio
    fmt: String,
    width: Long,
    height: Long,
    n_frames: Long,
    media: Array[Byte])

/** An image asset: opaque container bytes only — every derived field
  * must come out of the HEADER PARSE, not carried-along metadata.
  */
final case class ImageAsset(asset_id: Long, media: Array[Byte])

/** Header-decoded image metadata ([[MediaCodec.decodeHeader]]). */
final case class ImageDims(asset_id: Long, fmt: String, width: Long,
    height: Long, channels: Long)

/** A video asset: opaque MP4 container bytes only. */
final case class VideoAsset(asset_id: Long, media: Array[Byte])

/** Box-walk-decoded video metadata ([[MediaCodec.parseMp4]]). */
final case class VideoMeta(asset_id: Long, fmt: String, duration_ms: Long,
    width: Long, height: Long, n_tracks: Long)

/** An audio asset: opaque WAV container bytes only. */
final case class AudioAsset(asset_id: Long, media: Array[Byte])

/** Chunk-walk-decoded audio metadata ([[MediaCodec.parseWav]]). */
final case class AudioMeta(asset_id: Long, fmt: String, duration_ms: Long,
    sample_rate: Long, channels: Long, bits_per_sample: Long,
    n_samples: Long)

/** Decoded per-asset features (the output of the decode stub). */
final case class MediaFeatures(
    asset_id: Long,
    modality: String,
    byte_len: Long,
    byte_sum: Long,
    mean_byte_x100: Long,
    width: Long,
    height: Long)

/** Multimodal column plumbing: treat image/audio/video as opaque binary
  * columns with typed metadata; decode / feature-extract / frame-sample
  * are partition-batched operators over `Dataset[MediaAsset]`.
  *
  * The decode step is a STUB: this container has no media codecs, so
  * `decodeStub` computes deterministic byte statistics where a real
  * deployment would invoke the codec (JNI libjpeg/ffmpeg, or an
  * `mapInArrow`/Pandas-UDF bridge from PySpark). Everything around the
  * stub — the binary schema, the case-class encoders, the
  * `mapPartitions` batching that amortizes codec init per partition, the
  * explode-based frame sampling — is the real distributed plumbing and
  * is tested end-to-end.
  */
object Multimodal {

  /** The ONE definition of the deterministic fake-media dimensions —
    * shared by every asset builder here and MIRRORED by the
    * q_multimodal_features / q_frame_sample / q_image_dims oracles in
    * SparkEntry (change one side and the hash-match gate fails).
    */
  private def widthExpr = lit(16L) + col("n_chars") % 64
  private def heightExpr = lit(16L) + (col("n_chars") * 7) % 64

  /** Build assets from the documents table: the text bytes stand in as
    * deterministic fake media so every derived feature has a SQL oracle.
    * Metadata is a pure function of (doc_id, n_chars).
    */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(lit(Array("image", "video", "audio")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      element_at(lit(Array("png", "h264", "pcm16")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      widthExpr.as("width"),
      heightExpr.as("height"),
      when(col("doc_id") % 3 === 1, lit(1L) + col("doc_id") % 24)
        .otherwise(lit(1L)).as("n_frames"),
      encode(col("text"), "UTF-8").as("media"))
      .as[MediaAsset]
  }

  /** STUB decoder: deterministic byte statistics in place of pixel
    * decoding. A real codec would be initialized once per partition
    * (that is what the mapPartitions shape buys) and stream the batch
    * through native memory.
    */
  private def decodeStub(a: MediaAsset): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < a.media.length) { sum += a.media(i) & 0xff; i += 1 }
    val len = a.media.length.toLong
    MediaFeatures(a.asset_id, a.modality, len, sum,
      if (len == 0) 0L else sum * 100 / len, a.width, a.height)
  }

  /** Partition-batched feature extraction over the media bytes. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // real pipeline: initialize the codec/session here, once per batch
      batch.map(decodeStub)
    }
  }

  /** Image assets with REAL container bytes: each document becomes a
    * structurally-valid PNG or JPEG whose header encodes dimensions
    * derived from (doc_id, n_chars) and whose payload is the text
    * bytes. Downstream ([[decodeImageDims]]) sees ONLY the binary
    * column — the dims must be recovered by parsing, which is exactly
    * the decode-stage contract a real corpus imposes.
    */
  def imageAssets(spark: SparkSession, docs: DataFrame): Dataset[ImageAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), widthExpr.as("w"), heightExpr.as("h"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Long, Long, Array[Byte])]
      .map { case (id, wL, hL, payload) =>
        val (w, h) = (wL.toInt, hL.toInt)
        val bytes =
          if (id % 2 == 0)
            MediaCodec.pngHeader(w, h,
              colorType = if (id % 4 == 0) 6 else 2, payload)
          else
            MediaCodec.jpegHeader(w, h,
              nComp = if (id % 5 == 0) 1 else 3, payload)
        ImageAsset(id, bytes)
      }
  }

  /** Partition-batched header decode: sniff + parse each asset's magic
    * bytes into (fmt, width, height, channels). Assets whose container
    * fails to parse are DROPPED here (a curation pipeline quarantines
    * them); the oracle's row count therefore checks parse success for
    * every row.
    */
  def decodeImageDims(assets: Dataset[ImageAsset]): Dataset[ImageDims] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.decodeHeader(a.media).map(hdr =>
          ImageDims(a.asset_id, hdr.fmt, hdr.width.toLong,
            hdr.height.toLong, hdr.channels.toLong))
      }
    }
  }

  /** Video assets with REAL container bytes: each document becomes a
    * structurally-valid MP4 (ftyp + moov/mvhd/tkhd + mdat) whose boxes
    * encode duration and track dims derived from (doc_id, n_chars);
    * docs at doc_id % 4 == 0 carry a second, zero-dim (audio-like)
    * track, ODD doc_ids write version-1 (64-bit time) boxes (version
    * = doc_id % 2), and docs at doc_id % 91 == 0 are TRUNCATED mid-header — the
    * planted corruption the decode stage must quarantine. Downstream
    * sees only the binary column; everything must come out of the box
    * walk.
    *
    * The duration contract keeps the oracle integer-exact: timescale
    * 600, duration (1 + doc_id % 240) × 60 units → duration_ms =
    * (1 + doc_id % 240) × 100 exactly.
    */
  def videoAssets(spark: SparkSession, docs: DataFrame): Dataset[VideoAsset] = {
    import spark.implicits._
    docs.select(col("doc_id"), widthExpr.as("w"), heightExpr.as("h"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Long, Long, Array[Byte])]
      .map { case (id, wL, hL, payload) =>
        val tracks =
          if (id % 4 == 0) Seq((wL.toInt, hL.toInt), (0, 0))
          else Seq((wL.toInt, hL.toInt))
        val bytes = MediaCodec.mp4Header(timescale = 600,
          duration = (1 + id % 240) * 60, tracks = tracks,
          payload = payload, version = (id % 2).toInt)
        VideoAsset(id, if (id % 91 == 0) bytes.take(20) else bytes)
      }
  }

  /** Partition-batched MP4 metadata decode: box-walk each asset into
    * (duration_ms, width, height, n_tracks). Unparseable containers are
    * DROPPED (quarantine), mirroring [[decodeImageDims]].
    */
  def decodeVideoMeta(assets: Dataset[VideoAsset]): Dataset[VideoMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.parseMp4(a.media).map(hdr =>
          VideoMeta(a.asset_id, hdr.fmt, hdr.durationMs, hdr.width.toLong,
            hdr.height.toLong, hdr.nTracks.toLong))
      }
    }
  }

  /** Audio assets with REAL container bytes: each document becomes a
    * structurally-valid PCM WAV whose `fmt `/`data` chunks encode
    * stream parameters derived from doc_id — 8 kHz, 8·(1 + id % 125)
    * samples (so duration_ms = 1 + id % 125 EXACTLY), 1 + id % 2
    * channels, 8-bit where id % 3 == 0 else 16-bit. id % 5 == 0 docs
    * carry an odd-sized LIST junk chunk before `fmt ` (the parser must
    * chunk-walk and word-align), and id % 91 == 0 docs are TRUNCATED
    * mid-header — the planted corruption the decode stage must
    * quarantine. Downstream sees only the binary column.
    */
  def audioAssets(spark: SparkSession, docs: DataFrame): Dataset[AudioAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val bytes = MediaCodec.wavHeader(sampleRate = 8000,
        channels = 1 + (id % 2).toInt,
        bitsPerSample = if (id % 3 == 0) 8 else 16,
        nSamples = 8L * (1 + id % 125),
        junkChunk = id % 5 == 0,
        fill = (id & 0x7f).toByte)
      AudioAsset(id, if (id % 91 == 0) bytes.take(20) else bytes)
    }
  }

  /** Partition-batched WAV metadata decode: chunk-walk each asset into
    * stream parameters + duration. Unparseable containers are DROPPED
    * (quarantine), mirroring [[decodeImageDims]]/[[decodeVideoMeta]].
    */
  def decodeAudioMeta(assets: Dataset[AudioAsset]): Dataset[AudioMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.parseWav(a.media).map(hdr =>
          AudioMeta(a.asset_id, hdr.fmt, hdr.durationMs, hdr.sampleRate.toLong,
            hdr.channels.toLong, hdr.bitsPerSample.toLong, hdr.nSamples))
      }
    }
  }

  /** Frame sampling for video assets: every `step`-th frame index with
    * its byte offset (RGB24 layout) — pure metadata math, exploded
    * distributively; the media column is never read.
    */
  def sampleFrames(assets: Dataset[MediaAsset], step: Int = 4): DataFrame =
    assets.toDF()
      .filter(col("modality") === "video")
      .select(col("asset_id"), col("width"), col("height"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        (col("frame_idx") * col("width") * col("height") * 3).as("byte_offset"))
}
