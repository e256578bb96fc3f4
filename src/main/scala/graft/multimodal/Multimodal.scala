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

/** Per-asset 64-bit perceptual difference hash (dHash), split into two
  * 32-bit halves held in BIGINTs: sign-free in both engines, and the
  * band math for near-dup candidate generation stays simple integer
  * div/mod. Bit `by*8+bx` compares horizontally-adjacent cells of the
  * 9×8 block-mean grid.
  */
final case class ImagePhash(asset_id: Long, phash_hi: Long, phash_lo: Long)

/** Per-asset 64-bit audio fingerprint (frame-energy delta-sign chain),
  * split hi/lo like [[ImagePhash]] so the banded pairing machinery is
  * shared across modalities.
  */
final case class AudioAhash(asset_id: Long, ahash_hi: Long, ahash_lo: Long)

/** Per-asset 64-bit video fingerprint (per-frame luma-energy delta-sign
  * chain over decoded frames), split hi/lo like [[ImagePhash]] — the
  * video member of the shared banded near-dup machinery.
  */
final case class VideoVhash(asset_id: Long, vhash_hi: Long, vhash_lo: Long)

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
    graft.ops.FanOut(docs.select(col("doc_id"), widthExpr.as("w"),
        heightExpr.as("h"), encode(col("text"), "UTF-8").as("payload")))
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
    graft.ops.FanOut(docs.select(col("doc_id"), widthExpr.as("w"),
        heightExpr.as("h"), encode(col("text"), "UTF-8").as("payload")))
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
    graft.ops.FanOut(docs.select(col("doc_id"))).as[Long].map { id =>
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

  // --------------------------------------- pixel decode + image near-dup

  /** The ONE definition of the synthetic pixel content, mirrored by the
    * q_image_phash / q_image_phash_pairs oracles in SparkEntry: the
    * image is 36×32 (gray8, or RGB8/RGBA8 per [[pngColorType]] with
    * channels from [[channelValue]]), constant over 4×4 blocks, and
    * block (bx, by)
    * of document d has value ((m³ mod 509) + perturbation) mod 256 with
    * m = ((d/4)·72 + by·9 + bx) mod 509. The d/4 group key makes every
    * 4 consecutive docs share a base image; the perturbation (+8·(d%4)
    * on blocks where (bx + by·9 + d) ≡ 0 mod 23) gives group members
    * small pixel diffs — the near-duplicate structure the pHash pairing
    * must recover. m is reduced mod 509 BEFORE cubing so the product
    * stays < 2³⁰ at any corpus size (the unreduced cube overflows a
    * signed 64-bit integer once doc_id reaches ~10⁷).
    */
  private[multimodal] def blockValue(d: Long, bx: Int, by: Int): Int = {
    val m = ((d / 4) * 72 + by * 9 + bx) % 509
    val pert = if ((bx + by * 9 + d) % 23 == 0) (d % 4) * 8 else 0L
    (((m * m * m) % 509 + pert) % 256).toInt
  }

  private[multimodal] val PhashW = 36
  private[multimodal] val PhashH = 32

  /** Image assets with FULL pixel content: each document becomes a
    * complete spec-conformant PNG ([[MediaCodec.pngGray]] — real
    * deflate stream, per-row filter cycling through all five types,
    * CRC-32 on every chunk, multi-IDAT). Planted corruption the decode
    * stage must quarantine: doc_id % 91 == 0 truncated mid-stream,
    * doc_id % 97 == 0 carries a flipped byte inside the final IDAT
    * chunk (caught only by CRC verification — a parser that skips CRCs
    * would train on garbage pixels).
    */
  /** Which PNG color type document `d`'s asset uses — decided per
    * 4-doc GROUP (d/4) so near-dup group members share a type and the
    * planted small-diff pairing survives the color transform: groups
    * ≡ 1 mod 5 are palette (colorType 3), ≡ 2 mod 5 RGB8, ≡ 4 mod 5
    * RGBA8, the rest gray8.
    */
  private[multimodal] def pngColorType(d: Long): Int =
    ((d / 4) % 5) match { case 1 => 3; case 2 => 2; case 4 => 6; case _ => 0 }

  /** The 256-entry palette for the colorType-3 assets: entry i is
    * (R, G, B) = ([[channelValue]] of v = i for c = 0, 1, 2), so a
    * palette asset's decoded luma equals the truecolor luma of the same
    * block values — the oracle's color-luma formula covers both.
    */
  private[multimodal] val PhashPalette: Array[Array[Int]] =
    Array.tabulate(256)(i => Array(i, (i + 31) % 256, (i + 97) % 256))

  /** Channel value for color assets: R = v, G = (v+31) mod 256,
    * B = (v+97) mod 256, A = (v+d) mod 256 — distinct per channel (the
    * luma fold is non-trivial) yet pure integer formulas, so the
    * decoder's `(77R + 150G + 29B) >> 8` luma replays exactly in the
    * q_image_phash oracle. Alpha varies with d but never affects the
    * hash — pinning that the decoder treats assets as opaque.
    */
  private[multimodal] def channelValue(d: Long, v: Int, c: Int): Int = c match {
    case 0 => v
    case 1 => (v + 31) % 256
    case 2 => (v + 97) % 256
    case _ => ((v + d) % 256).toInt
  }

  def phashImageAssets(spark: SparkSession, docs: DataFrame): Dataset[ImageAsset] = {
    import spark.implicits._
    graft.ops.FanOut(docs.select(col("doc_id"))).as[Long].map { id =>
      val colorType = pngColorType(id)
      val bytes =
        if (colorType == 0)
          MediaCodec.pngGray(PhashW, PhashH,
            (x, y) => blockValue(id, x / 4, y / 4),
            y => ((id + y) % 5).toInt)
        else if (colorType == 3)
          // palette asset: the index IS the block value; PLTE entry i
          // mirrors channelValue(i), so luma matches the truecolor path
          MediaCodec.pngPalette(PhashW, PhashH, PhashPalette,
            (x, y) => blockValue(id, x / 4, y / 4),
            y => ((id + y) % 5).toInt)
        else
          MediaCodec.pngColor(PhashW, PhashH, colorType,
            (x, y, c) => channelValue(id, blockValue(id, x / 4, y / 4), c),
            y => ((id + y) % 5).toInt)
      val out =
        if (id % 91 == 0) bytes.take(40)
        else if (id % 97 == 0) {
          val c = bytes.clone()
          c(c.length - 20) = (c(c.length - 20) ^ 0x5a).toByte
          c
        } else bytes
      ImageAsset(id, out)
    }
  }

  /** 64-bit dHash from decoded pixels: mean over each cell of the 9×8
    * grid (cell = width/9 × height/8, integer floor mean), then bit
    * `by*8+bx` = 1 iff cell (bx+1, by) is brighter than (bx, by).
    * Returns None when the image is too small to grid (quarantine).
    */
  private[multimodal] def dHash(img: MediaCodec.PixelImage): Option[(Long, Long)] = {
    val cw = img.width / 9
    val ch = img.height / 8
    if (cw <= 0 || ch <= 0) return None
    val grid = Array.ofDim[Long](9, 8)
    var bx = 0
    while (bx < 9) {
      var by = 0
      while (by < 8) {
        var s = 0L
        var y = by * ch
        while (y < (by + 1) * ch) {
          var x = bx * cw
          while (x < (bx + 1) * cw) { s += img.px(y * img.width + x) & 0xff; x += 1 }
          y += 1
        }
        grid(bx)(by) = s / (cw * ch)
        by += 1
      }
      bx += 1
    }
    var hi = 0L; var lo = 0L
    var by = 0
    while (by < 8) {
      bx = 0
      while (bx < 8) {
        if (grid(bx + 1)(by) > grid(bx)(by)) {
          val pos = by * 8 + bx
          if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
        }
        bx += 1
      }
      by += 1
    }
    Some((hi, lo))
  }

  /** Partition-batched pixel decode + perceptual hash: full PNG decode
    * ([[MediaCodec.decodePngPixels]] — CRC verify, inflate, unfilter)
    * then [[dHash]] over the recovered pixels. Undecodable assets are
    * DROPPED (quarantine), mirroring [[decodeImageDims]]. The media
    * column is read exactly once, in this stage; everything downstream
    * (pairing, clustering) works on the 16-byte hash — the 100 TB shape
    * where the petabyte media column never reaches a shuffle.
    */
  def decodePhash(assets: Dataset[ImageAsset]): Dataset[ImagePhash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.decodePngPixels(a.media).flatMap(dHash(_)).map {
          case (hi, lo) => ImagePhash(a.asset_id, hi, lo)
        }
      }
    }
  }

  /** JPEG assets with FULL pixel content — a MIXED gray + color corpus:
    * per (doc_id / 4) group, mode = group % 3 picks grayscale
    * ([[MediaCodec.jpegGray]]), 4:2:0 color or 4:4:4 color
    * ([[MediaCodec.jpegColor]] — interleaved scan, two quantization
    * tables, distinct chroma Huffman tables). All three are complete
    * baseline JFIFs of 72×64 luma pixels in an 8×8-block mosaic of the
    * SAME [[blockValue]] pattern the PNG assets carry; color modes add
    * block-constant chroma planes at one value per 2×2 luma-cell quad
    * ([[chromaCb]]/[[chromaCr]] at cell (bx/2, by/2)), declared so BOTH
    * color modes decode to the same formula-replayable luma. The
    * all-ones luma / all-twos chroma quantization keeps every
    * block-constant plane exact through encode→decode. Planted
    * corruption: doc_id % 91 == 0 TRUNCATED mid-stream (quarantine).
    * Unlike PNG there is NO bit-flip plant: a JPEG entropy stream
    * carries no CRC, so a flipped bit decodes to silently different
    * pixels rather than a detectable defect — the fuzz spec still
    * proves flips never throw, but the oracle can only predict
    * structurally-intact streams.
    */
  def jpegImageAssets(spark: SparkSession, docs: DataFrame): Dataset[ImageAsset] = {
    import spark.implicits._
    graft.ops.FanOut(docs.select(col("doc_id"))).as[Long].map { id =>
      val bytes = ((id / 4) % 3).toInt match {
        case 0 =>
          MediaCodec.jpegGray(JpegW, JpegH,
            (x, y) => blockValue(id, x / 8, y / 8))
        case 1 => // 4:2:0 — chroma declared at 36×32, constant per
          // chroma 8×8 block = per 2×2 luma-cell quad
          MediaCodec.jpegColor(JpegW, JpegH,
            (x, y) => blockValue(id, x / 8, y / 8),
            (cx, cy) => chromaCb(id, cx / 8, cy / 8),
            (cx, cy) => chromaCr(id, cx / 8, cy / 8),
            subsample = true)
        case _ => // 4:4:4 — full-res chroma constant per 16×16 pixel
          // quad: the SAME per-(bx/2, by/2) values as the 4:2:0 mode
          MediaCodec.jpegColor(JpegW, JpegH,
            (x, y) => blockValue(id, x / 8, y / 8),
            (x, y) => chromaCb(id, x / 16, y / 16),
            (x, y) => chromaCr(id, x / 16, y / 16),
            subsample = false)
      }
      ImageAsset(id, if (id % 91 == 0) bytes.take(60) else bytes)
    }
  }

  private[multimodal] val JpegW = 72
  private[multimodal] val JpegH = 64

  /** Chroma-cell values for the COLOR JPEG assets, indexed by the
    * 2×2 luma-cell quad (cx, cy) = (bx/2, by/2): in 4:2:0 the value
    * lands on chroma block (cx, cy) of the 36×32 chroma plane; in
    * 4:4:4 on the 16×16 pixel quad — either way every 8×8 luma cell
    * sees exactly ONE (cb, cr), which is what keeps the decoded luma
    * ([[MediaCodec.decodeJpeg]]'s integer YCbCr fold) block-constant
    * and the oracle a closed formula.
    */
  private[multimodal] def chromaCb(d: Long, cx: Int, cy: Int): Int =
    (((d / 4) * 113 + cx * 7 + cy * 31) % 256).toInt
  private[multimodal] def chromaCr(d: Long, cx: Int, cy: Int): Int =
    (((d / 4) * 127 + cx * 11 + cy * 17) % 256).toInt

  /** Partition-batched JPEG pixel decode + perceptual hash: full
    * baseline decode ([[MediaCodec.decodeJpeg]] — marker walk, Huffman,
    * dequantize, IDCT; for color streams interleaved-MCU decode,
    * chroma upsampling and the integer YCbCr→luma fold) then the SAME
    * [[dHash]] as the PNG path. At 72×64 the 9×8 dHash grid cell is
    * exactly one 8×8 JPEG block, so the hash is a pure function of the
    * block mosaic (+ per-quad chroma for the color modes) — the oracle
    * replays it formula-for-formula. Undecodable assets DROP
    * (quarantine); the media column is read exactly once.
    */
  def decodeJpegPhash(assets: Dataset[ImageAsset]): Dataset[ImagePhash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.decodeJpeg(a.media).flatMap(dHash(_)).map {
          case (hi, lo) => ImagePhash(a.asset_id, hi, lo)
        }
      }
    }
  }

  /** Image near-duplicate pairs by banded pHash: split each 64-bit hash
    * into 4 × 16-bit bands, equi-join on (band, value) to generate
    * candidates — the same LSH-banding shape as the MinHash text path,
    * NEVER all-pairs — then verify each candidate exactly with
    * bit_count(xor) ≤ maxHamming over the full hash. Candidate
    * generation is a content-key shuffle (16-bit band values); the
    * verify join ships only (id, hi, lo). The banding is honestly
    * approximate: a pair whose every band is hit by a flipped bit is
    * missed, and the oracle replays the SAME candidate rule so the
    * contract is the algorithm, not an all-pairs ideal.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashes.select(col("asset_id"),
      posexplode(array(
        col("phash_lo").bitwiseAND(lit(65535L)),
        shiftright(col("phash_lo"), 16),
        col("phash_hi").bitwiseAND(lit(65535L)),
        shiftright(col("phash_hi"), 16))).as(Seq("band", "v")))
    val cand = bands.select(col("asset_id").as("a_id"), col("band"), col("v"))
      .join(bands.select(col("asset_id").as("b_id"), col("band"), col("v")),
        Seq("band", "v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val ha = hashes.select(col("asset_id").as("a_id"),
      col("phash_hi").as("a_hi"), col("phash_lo").as("a_lo"))
    val hb = hashes.select(col("asset_id").as("b_id"),
      col("phash_hi").as("b_hi"), col("phash_lo").as("b_lo"))
    cand.join(ha, "a_id").join(hb, "b_id")
      .withColumn("hamming",
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Connected-component EDGES for fingerprint clustering, with
    * EXACT-HASH CONTRACTION before the banded join (r16 — the named
    * sf10 OOM mechanism): a corpus where many assets share one
    * fingerprint (identical media are the COMMON case in a crawled
    * corpus, and the sf10 synthetic audio corpus holds 197k assets
    * over 1,617 distinct hashes) makes every equal-hash group collide
    * in EVERY band, so [[phashPairs]]'s candidate relation carries
    * Σ C(K,2) ≈ quadratic rows — measured 252M candidate rows for
    * audio at sf10, a 4 GiB single-task sort allocation, and the
    * joint-JVM OOM.
    *
    * Cluster labels never needed those pairs. This builder emits:
    *  - one STAR edge (min-id rep → member) per equal-hash group —
    *    K−1 edges, linear; and
    *  - [[phashPairs]] near-dup edges over the DISTINCT-hash reps
    *    only — the banding input shrinks from corpus size to content
    *    diversity (1,617 rows instead of 197k for sf10 audio).
    *
    * The connected components are PROVABLY those of the full pair
    * relation: members of an equal-hash group share every band and
    * verify at Hamming 0, so the full relation connects them — the
    * star does too; and for a ∈ X, b ∈ Y (distinct hashes X ≠ Y),
    * bands and Hamming are functions of the HASH alone, so (a, b) is
    * a full-relation edge iff (rep_X, rep_Y) is an edge here, and
    * a—rep_X—rep_Y—b connects the same component. Min-id labels are
    * therefore identical, and every cluster-label oracle is unchanged
    * (CurationSpec pins the equivalence against the full relation).
    *
    * Scale shape: the contraction groupBy shuffles 16-byte hashes; the
    * star-edge join is skew-bounded by AQE (a mega-group ships K rows
    * to one reducer but writes K−1 edges — linear, never C(K,2));
    * the banded join runs at content diversity, not corpus size.
    * Serving members that genuinely SELL the pair relation
    * (q_image_phash_pairs etc.) keep [[phashPairs]] unchanged.
    */
  def phashClusterEdges(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val stats = graft.dedup.Dedup.contractionProfile(
      hashes, Seq("phash_hi", "phash_lo"))
    if (!stats.contract) {
      // duplicate-MASS gate (r17,
      // [[graft.dedup.Dedup.ContractionStats.contract]]): fingerprint
      // multiplicity is linear-bounded — band the original hash table
      // directly; media corpora with content-identical assets (the r15
      // sf10 OOM: Σk(k−1) ≈ 24M over 197k audio assets) stay on the
      // contraction path
      phashPairs(hashes, maxHamming).select(col("a_id"), col("b_id"))
    } else {
      val groups = graft.dedup.Dedup.contractionGroups(
        hashes, Seq("phash_hi", "phash_lo"), "asset_id")
      val exact = hashes
        .join(groups, Seq("phash_hi", "phash_lo"))
        .filter(col("asset_id") =!= col("rep"))
        .select(col("rep").as("a_id"), col("asset_id").as("b_id"))
      val near = phashPairs(
        groups.select(col("rep").as("asset_id"),
          col("phash_hi"), col("phash_lo")),
        maxHamming).select(col("a_id"), col("b_id"))
      exact.unionByName(near)
    }
  }

  // ------------------------------------------- audio content fingerprint

  private[multimodal] val AhashFrames = 65
  private[multimodal] val AhashFrameLen = 32

  /** The ONE definition of the synthetic PCM content, mirrored by the
    * q_audio_ahash oracles: sample `s` of document `d` is
    * ((m³ mod 509 + perturbation) mod 1024) − 512 with
    * m = ((d/4)·97 + s) mod 509 — the d/4 group key gives every 4
    * consecutive docs the same base waveform, and the perturbation
    * (+16·(d%4) on samples where (s + d) ≡ 0 mod 37) plants the
    * small-diff near-dup structure the fingerprint pairing must
    * recover. All-integer, so frame energies are exact in both engines.
    */
  private[multimodal] def sampleValue(d: Long, s: Int): Int = {
    val m = ((d / 4) * 97 + s) % 509
    val pert = if ((s + d) % 37 == 0) (d % 4) * 16 else 0L
    ((((m * m * m) % 509 + pert) % 1024) - 512).toInt
  }

  /** Audio assets with FULL PCM content: each document becomes a
    * complete 16-bit mono WAV ([[MediaCodec.wavPcm16Mono]] — real RIFF
    * layout, real little-endian samples). Planted corruption the decode
    * stage must quarantine: doc_id % 89 == 0 truncated mid-header.
    */
  def ahashAudioAssets(spark: SparkSession, docs: DataFrame): Dataset[AudioAsset] = {
    import spark.implicits._
    graft.ops.FanOut(docs.select(col("doc_id"))).as[Long].map { id =>
      val bytes = MediaCodec.wavPcm16Mono(8000, AhashFrames * AhashFrameLen,
        s => sampleValue(id, s))
      AudioAsset(id, if (id % 89 == 0) bytes.take(30) else bytes)
    }
  }

  /** Pack a 65-entry energy sequence into the 64-bit delta-sign chain:
    * bit `f` = 1 iff `e(f+1) > e(f)`, split hi/lo — the ONE packing
    * shared by the audio ([[aHash]]) and video ([[vHash]]) fingerprints.
    */
  private def deltaSignPack(e: Array[Long]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var f = 0
    while (f < 64) {
      if (e(f + 1) > e(f)) {
        if (f >= 32) hi |= 1L << (f - 32) else lo |= 1L << f
      }
      f += 1
    }
    (hi, lo)
  }

  /** 64-bit aHash from decoded samples: per-frame integer energy
    * (Σ|sample| over [[AhashFrameLen]]-sample frames — exact in Long),
    * then bit `f` = 1 iff frame f+1 is more energetic than frame f —
    * the dHash delta-sign chain applied along time instead of space.
    * None when the clip is shorter than the frame grid (quarantine).
    */
  private[multimodal] def aHash(samples: Array[Int]): Option[(Long, Long)] = {
    val fl = AhashFrameLen
    if (samples.length < AhashFrames * fl) return None
    val e = Array.tabulate(AhashFrames) { f =>
      var acc = 0L; var i = f * fl
      while (i < (f + 1) * fl) { acc += math.abs(samples(i)); i += 1 }
      acc
    }
    Some(deltaSignPack(e))
  }

  /** Partition-batched PCM decode + fingerprint: full WAV decode
    * ([[MediaCodec.decodeWavPcm16Mono]] — chunk walk, format contract,
    * sample decode) then [[aHash]]. Undecodable assets are DROPPED
    * (quarantine). The media column is read exactly once, here;
    * downstream ships 16 bytes per asset.
    */
  def decodeAhash(assets: Dataset[AudioAsset]): Dataset[AudioAhash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.decodeWavPcm16Mono(a.media).flatMap(aHash).map {
          case (hi, lo) => AudioAhash(a.asset_id, hi, lo)
        }
      }
    }
  }

  // ------------------------------------------- video content fingerprint

  private[multimodal] val VhashFrames = 65
  private[multimodal] val VhashFrameW = 8
  private[multimodal] val VhashFrameH = 4

  /** The ONE definition of the synthetic frame content, mirrored by the
    * q_video_vhash oracles: pixel `i` (row-major, 8×4 = 32 per frame) of
    * frame `f` of document `d` is ((m³ mod 509 + perturbation) mod 256)
    * with m = ((d/4)·103 + f·32 + i) mod 509 — the d/4 group key gives
    * every 4 consecutive docs the same base footage, and the
    * perturbation (+8·(d%4) on pixels where (f·32 + i + d) ≡ 0 mod 43)
    * plants the small-diff near-dup structure the fingerprint pairing
    * must recover. All-integer, so frame energies are exact in both
    * engines — the [[sampleValue]] recipe applied to luma.
    */
  private[multimodal] def framePixel(d: Long, f: Int, i: Int): Int = {
    val m = ((d / 4) * 103 + f * 32 + i) % 509
    val pert = if ((f * 32 + i + d) % 43 == 0) (d % 4) * 8 else 0L
    (((m * m * m) % 509 + pert) % 256).toInt
  }

  /** Video assets with FULL frame content: each document becomes a
    * complete MP4 whose single mdat holds [[VhashFrames]] real raw-luma
    * frames ([[MediaCodec.mp4LumaVideo]] — real ftyp/moov/mvhd/tkhd
    * boxes around real content bytes). Planted corruption the decode
    * stage must quarantine: doc_id % 83 == 0 truncated mid-header.
    */
  def vhashVideoAssets(spark: SparkSession, docs: DataFrame): Dataset[VideoAsset] = {
    import spark.implicits._
    graft.ops.FanOut(docs.select(col("doc_id"))).as[Long].map { id =>
      val bytes = MediaCodec.mp4LumaVideo(VhashFrameW, VhashFrameH,
        VhashFrames, (f, i) => framePixel(id, f, i))
      VideoAsset(id, if (id % 83 == 0) bytes.take(25) else bytes)
    }
  }

  /** 64-bit vHash from decoded frames: per-frame integer luma energy
    * (Σ pixel over the width·height gray8 frame — exact in Long), then
    * the shared delta-sign chain — [[aHash]]'s recipe along the frame
    * axis. None when the clip is shorter than the 65-frame grid
    * (quarantine).
    */
  private[multimodal] def vHash(v: MediaCodec.LumaVideo): Option[(Long, Long)] = {
    val fl = v.width * v.height
    if (v.nFrames < VhashFrames) return None
    val e = Array.tabulate(VhashFrames) { f =>
      var acc = 0L; var i = f * fl
      while (i < (f + 1) * fl) { acc += v.px(i) & 0xff; i += 1 }
      acc
    }
    Some(deltaSignPack(e))
  }

  /** Partition-batched MP4 decode + fingerprint: full raw-luma decode
    * ([[MediaCodec.decodeMp4Luma]] — box walk, single-mdat contract,
    * whole-frame payload check) then [[vHash]]. Undecodable assets are
    * DROPPED (quarantine). The media column is read exactly once, here;
    * downstream ships 16 bytes per asset — same 100 TB shape as the
    * image and audio fingerprint stages.
    */
  def decodeVhash(assets: Dataset[VideoAsset]): Dataset[VideoVhash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.flatMap { a =>
        MediaCodec.decodeMp4Luma(a.media).flatMap(vHash).map {
          case (hi, lo) => VideoVhash(a.asset_id, hi, lo)
        }
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
