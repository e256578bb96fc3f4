package graft.multimodal

/** Pure-JVM image HEADER codec: container-format dimension/channel
  * extraction from magic bytes — no native codec, no pixel decode.
  *
  * This is the real first stage of any 100 TB media pipeline: routing,
  * partition sizing and metadata validation all need (format, width,
  * height, channels) without paying a pixel decode, and both PNG and
  * JPEG carry them in the first few hundred bytes. The pixel stage
  * stays behind the mapPartitions codec boundary
  * ([[Multimodal.extractFeatures]]).
  *
  * Formats implemented from their public specs:
  *  - PNG (RFC 2083 / W3C): 8-byte signature, then the IHDR chunk —
  *    width/height as 4-byte big-endian at offsets 16/20, bit depth at
  *    24, color type at 25 (0 gray, 2 RGB, 3 palette, 4 gray+alpha,
  *    6 RGBA).
  *  - JPEG (ITU T.81 / JFIF): FF D8 SOI, then a marker walk — each
  *    segment FF xx + 2-byte big-endian length (self-inclusive) — until
  *    a frame header SOFn (C0–CF except C4/C8/CC): precision byte, then
  *    height, width as 2-byte big-endian, then component count.
  */
object MediaCodec {

  /** Parsed header metadata. `channels` is the per-pixel component
    * count the container declares.
    */
  final case class ImageHeader(fmt: String, width: Int, height: Int,
      channels: Int)

  private val PngSig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** PNG color type → channel count (spec §6.1). */
  private def pngChannels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1) // grayscale
    case 2 => Some(3) // truecolor
    case 3 => Some(1) // palette index
    case 4 => Some(2) // grayscale + alpha
    case 6 => Some(4) // truecolor + alpha
    case _ => None
  }

  def parsePng(b: Array[Byte]): Option[ImageHeader] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR: length(4) "IHDR"(4) payload(13)
    if (be32(b, 8) != 13) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    pngChannels(u8(b, 25)).map(ImageHeader("png", w, h, _))
  }

  /** SOFn markers that carry frame dimensions: C0–CF minus C4 (DHT),
    * C8 (JPG extension), CC (DAC).
    */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  def parseJpeg(b: Array[Byte]): Option[ImageHeader] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // marker desync: corrupt stream
      val marker = u8(b, i + 1)
      if (marker == 0xff) { i += 1 } // fill byte padding before a marker
      else if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS before any SOF
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        if (isSof(marker)) {
          if (len < 8) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val nComp = u8(b, i + 9)
          return if (w > 0 && h > 0 && nComp > 0)
            Some(ImageHeader("jpeg", w, h, nComp)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** Sniff the container from its magic bytes and parse the header. */
  def decodeHeader(b: Array[Byte]): Option[ImageHeader] =
    if (b.length >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) parseJpeg(b)
    else parsePng(b)

  // ------------------------------------------------------------- MP4

  /** Parsed MP4 movie metadata: presentation duration in milliseconds
    * (mvhd duration/timescale, floor), the FIRST track with nonzero
    * tkhd dimensions (the video track; audio tracks carry 0×0), and the
    * total trak count.
    */
  final case class VideoHeader(fmt: String, durationMs: Long, width: Int,
      height: Int, nTracks: Int)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes in [from, until): calls `f(type, payloadStart,
    * payloadEnd)` per box. Returns false on structural corruption
    * (truncated header, size too small / past the range, unsupported
    * 64-bit largesize). ISO/IEC 14496-12 §4.2: size includes the 8-byte
    * header; size==0 means "to end of enclosing container".
    */
  private def walkBoxes(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var i = from
    while (i < until) {
      if (i + 8 > until) return false
      // size is UNSIGNED 32-bit: mask, or a 2 GiB+ box reads negative
      val size = be32(b, i).toLong & 0xffffffffL
      if (size == 1) return false // 64-bit largesize: not in this corpus
      val end = if (size == 0) until.toLong else i + size
      if (size != 0 && size < 8) return false
      if (end > until) return false
      f(boxType(b, i + 4), i + 8, end.toInt)
      i = end.toInt
    }
    true
  }

  /** MP4 / ISO BMFF metadata extraction (ISO/IEC 14496-12): top-level
    * box walk to `moov`, then `mvhd` (version 0 or 1 — timescale +
    * duration) and each `trak`'s `tkhd` (width/height as 16.16 fixed
    * point after the 36-byte matrix). Any structural corruption —
    * truncated box, bad size, missing/short mvhd, zero timescale —
    * returns None; a curation pipeline quarantines the asset.
    */
  def parseMp4(b: Array[Byte]): Option[VideoHeader] = {
    if (b.length < 16) return None
    var moov: Option[(Int, Int)] = None
    if (!walkBoxes(b, 0, b.length) { (t, s, e) =>
      if (t == "moov" && moov.isEmpty) moov = Some((s, e))
    }) return None
    val (ms, me) = moov.getOrElse(return None)
    var durationMs = -1L
    var dims: Option[(Int, Int)] = None
    var nTracks = 0
    var ok = true
    if (!walkBoxes(b, ms, me) { (t, s, e) =>
      if (t == "mvhd") {
        val v = if (e > s) u8(b, s) else -1
        // v0: vf(4) ctime(4) mtime(4) timescale(4) duration(4)
        // v1: vf(4) ctime(8) mtime(8) timescale(4) duration(8)
        // timescale and v0 duration are UNSIGNED 32-bit — mask before
        // widening, or a 6.6 h+ recording (duration >= 2^31) reads
        // negative and a valid asset is misquarantined
        if (v == 0 && e - s >= 20) {
          val ts = be32(b, s + 12).toLong & 0xffffffffL
          if (ts > 0)
            durationMs = (be32(b, s + 16).toLong & 0xffffffffL) * 1000L / ts
          else ok = false
        } else if (v == 1 && e - s >= 32) {
          val ts = be32(b, s + 20).toLong & 0xffffffffL
          val dur = ((be32(b, s + 24).toLong & 0xffffffffL) << 32) |
            (be32(b, s + 28).toLong & 0xffffffffL)
          if (ts > 0) durationMs = dur * 1000L / ts else ok = false
        } else ok = false
      } else if (t == "trak") {
        nTracks += 1
        if (!walkBoxes(b, s, e) { (tt, ts2, te) =>
          if (tt == "tkhd") {
            val v = if (te > ts2) u8(b, ts2) else -1
            // width offset in the tkhd payload: v0 76, v1 88 (16.16)
            val off = if (v == 0) 76 else if (v == 1) 88 else -1
            if (off > 0 && te - ts2 >= off + 8) {
              val w = be32(b, ts2 + off) >>> 16
              val h = be32(b, ts2 + off + 4) >>> 16
              if (w > 0 && h > 0 && dims.isEmpty) dims = Some((w, h))
            } else ok = false
          }
        }) ok = false
      }
    }) return None
    if (!ok || durationMs < 0) return None
    dims.map { case (w, h) => VideoHeader("mp4", durationMs, w, h, nTracks) }
  }

  // ------------------------------------------------------------- WAV

  /** Parsed WAV (RIFF/WAVE) audio metadata: PCM stream parameters from
    * the `fmt ` chunk plus sample count derived from the `data` chunk
    * size; duration is floor(nSamples · 1000 / sampleRate) ms.
    */
  final case class AudioHeader(fmt: String, durationMs: Long,
      sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Long)

  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** WAV metadata extraction (RIFF spec; multimedia file formats are
    * little-endian, unlike ISO BMFF): verify the RIFF/WAVE magic, then
    * walk the chunk list — id(4) + size(4) + payload, payloads padded
    * to even offsets — taking the FIRST `fmt ` and `data` chunks and
    * SKIPPING everything else (LIST/INFO, cue, junk: real encoders
    * emit them, so a fixed-offset read is wrong). Validation: the
    * format tag must be 1 (integer PCM), rate/channels positive, bits
    * a multiple of 8, and the redundant fields (blockAlign, byteRate)
    * CONSISTENT — an inconsistent header is corruption, not a value to
    * silently prefer one side of. The data size must be a whole number
    * of frames. Any violation, truncation, or missing chunk → None;
    * the curation pipeline quarantines the asset.
    */
  def parseWav(b: Array[Byte]): Option[AudioHeader] = {
    if (b.length < 12) return None
    if (boxType(b, 0) != "RIFF" || boxType(b, 8) != "WAVE") return None
    // RIFF size covers everything after its own 8-byte header; a size
    // pointing past the buffer means truncation
    val riffEnd = 8L + (le32(b, 4).toLong & 0xffffffffL)
    if (riffEnd > b.length) return None
    val until = riffEnd.toInt
    var fmtChunk: Option[(Int, Int)] = None
    var dataSize = -1L
    var i = 12
    while (i < until) {
      if (i + 8 > until) return None
      val size = le32(b, i + 4).toLong & 0xffffffffL
      val end = i + 8 + size
      if (end > until) return None
      boxType(b, i) match {
        case "fmt " if fmtChunk.isEmpty => fmtChunk = Some((i + 8, end.toInt))
        case "data" if dataSize < 0 => dataSize = size
        case _ => // unknown chunk: skip
      }
      i = (end + (size & 1L)).toInt // chunks are word-aligned: odd pads 1
    }
    val (fs, fe) = fmtChunk.getOrElse(return None)
    if (dataSize < 0 || fe - fs < 16) return None
    val formatTag = le16(b, fs)
    val channels = le16(b, fs + 2)
    val sampleRate = le32(b, fs + 4)
    val byteRate = le32(b, fs + 8)
    val blockAlign = le16(b, fs + 12)
    val bits = le16(b, fs + 14)
    if (formatTag != 1 || channels <= 0 || sampleRate <= 0 ||
      bits <= 0 || bits % 8 != 0) return None
    // consistency products in Long: 16-bit channels × 16-bit bits (and
    // 31-bit rate × 16-bit align) overflow Int, and a wrapped product
    // matching a corrupt field would pass the check it should fail
    if (blockAlign.toLong != channels.toLong * bits / 8) return None
    if ((byteRate.toLong & 0xffffffffL) !=
      sampleRate.toLong * blockAlign) return None
    if (dataSize % blockAlign != 0) return None
    val nSamples = dataSize / blockAlign
    Some(AudioHeader("wav", nSamples * 1000L / sampleRate, sampleRate,
      channels, bits, nSamples))
  }

  // ------------------------------------------------- PNG pixel codec

  /** A decoded 8-bit grayscale image: `px(y * width + x)` is the pixel
    * value 0–255 (stored as a signed byte; mask with `& 0xff`).
    */
  final case class PixelImage(width: Int, height: Int, px: Array[Byte])

  /** Decode-side pixel budget (64 Mpx ≈ 64 MB gray8): dimensions any
    * larger in a CURATION corpus are corruption or abuse, and the cap is
    * what keeps a crafted IHDR from OOMing an executor.
    */
  private val MaxDecodePixels: Long = 1L << 26

  /** Paeth predictor (PNG spec §9.4): the neighbor (left, up, upleft)
    * closest to left + up − upleft, ties broken left, up, upleft.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunkCrc(chunkType: String, payload: Array[Byte],
      from: Int, len: Int): Int = {
    val crc = new java.util.zip.CRC32()
    chunkType.foreach(c => crc.update(c.toInt))
    crc.update(payload, from, len)
    crc.getValue.toInt
  }

  private def writeChunk(o: java.io.ByteArrayOutputStream, chunkType: String,
      payload: Array[Byte], from: Int = 0, len: Int = -1): Unit = {
    val n = if (len < 0) payload.length else len
    writeBe32(o, n)
    chunkType.foreach(c => o.write(c.toInt))
    o.write(payload, from, n)
    writeBe32(o, chunkCrc(chunkType, payload, from, n))
  }

  /** Encode an 8-bit GRAYSCALE image as a complete, spec-conformant PNG
    * (RFC 2083): signature, IHDR, zlib-deflated filtered scanlines split
    * across multiple IDAT chunks (512-byte slices — a conformant reader
    * MUST concatenate IDATs before inflating, so a single-IDAT shortcut
    * in the decoder would fail its own synthesizer), IEND, real CRC-32
    * on every chunk. `filterForRow` picks the per-row filter type 0–4 —
    * the encoder applies the filter FORWARD so the decoder's unfilter
    * path for every type is exercised by round-trip.
    */
  def pngGray(w: Int, h: Int, pixel: (Int, Int) => Int,
      filterForRow: Int => Int = _ => 0): Array[Byte] =
    pngEncode(w, h, colorType = 0, (x, y, _) => pixel(x, y), filterForRow)

  /** [[pngGray]]'s color generalization: encode 8-bit truecolor
    * (`colorType` 2, RGB), grayscale+alpha (4) or truecolor+alpha (6,
    * RGBA) from a per-(x, y, channel) sample function — same real deflate stream,
    * per-row filters, multi-IDAT and CRC-32 as the grayscale form. PNG
    * filters operate BYTEWISE with "left" meaning `bpp` bytes back
    * (spec §9.2), which is exactly what the decoder must reverse — so
    * round-tripping color assets exercises the bpp-aware unfilter path.
    */
  def pngColor(w: Int, h: Int, colorType: Int,
      sample: (Int, Int, Int) => Int,
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(colorType == 2 || colorType == 4 || colorType == 6,
      s"colorType $colorType")
    pngEncode(w, h, colorType, sample, filterForRow)
  }

  /** Palette PNG (colorType 3): scanlines carry 8-bit PALETTE INDICES
    * (bpp = 1 — filters operate on the index bytes, spec §9.2) and a
    * PLTE chunk of 1–256 RGB triples maps them to color. Same real
    * deflate stream, per-row filters, multi-IDAT and CRC-32 as the
    * other encoders; `palette(i)` is the (R, G, B) of index i and
    * `index(x, y)` must stay within it.
    */
  def pngPalette(w: Int, h: Int, palette: Array[Array[Int]],
      index: (Int, Int) => Int,
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length}")
    val plte = new Array[Byte](palette.length * 3)
    for (i <- palette.indices) {
      require(palette(i).length == 3, s"palette entry $i")
      for (c <- 0 until 3) plte(3 * i + c) = (palette(i)(c) & 0xff).toByte
    }
    pngEncode(w, h, colorType = 3, (x, y, _) => {
      val v = index(x, y)
      require(v >= 0 && v < palette.length, s"index ($x,$y) = $v out of palette")
      v
    }, filterForRow, plte)
  }

  private def pngEncode(w: Int, h: Int, colorType: Int,
      sample: (Int, Int, Int) => Int,
      filterForRow: Int => Int, plte: Array[Byte] = null): Array[Byte] = {
    require(w > 0 && h > 0, s"pngEncode ${w}x$h")
    val bpp = pngChannels(colorType).get // bit depth 8: bytes == channels
    val stride = w * bpp + 1 // filter byte + w*bpp samples per row
    val raw = new Array[Byte](h * stride)
    // two-row sample buffers (r18): the filter references each sample
    // up to FOUR times (cur, left, up, up-left) and `sample` is the
    // caller's per-pixel generator closure — evaluate it exactly once
    // per (x, y, c) and filter from the buffers. Identical bytes (same
    // sample values, same filters); executor sampling put the repeated
    // closure calls at the top of the mm members' CPU profile.
    var prevRow = new Array[Int](w * bpp)
    var curRow = new Array[Int](w * bpp)
    var y = 0
    while (y < h) {
      val f = filterForRow(y)
      require(f >= 0 && f <= 4, s"filter $f")
      val rowOff = y * stride
      raw(rowOff) = f.toByte
      var i = 0
      while (i < w * bpp) {
        curRow(i) = sample(i / bpp, y, i % bpp) & 0xff
        i += 1
      }
      i = 0
      while (i < w * bpp) {
        val cur = curRow(i)
        val left = if (i >= bpp) curRow(i - bpp) else 0
        val up = if (y > 0) prevRow(i) else 0
        val upLeft = if (i >= bpp && y > 0) prevRow(i - bpp) else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(rowOff + 1 + i) = filtered.toByte
        i += 1
      }
      val t = prevRow; prevRow = curRow; curRow = t
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished())
      zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    val ihdr = new java.io.ByteArrayOutputStream()
    writeBe32(ihdr, w); writeBe32(ihdr, h)
    ihdr.write(8) // bit depth
    ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
    writeChunk(out, "IHDR", ihdr.toByteArray)
    if (plte != null) writeChunk(out, "PLTE", plte) // before IDAT (§4.1.2)
    var off = 0
    while (off < z.length) {
      val n = math.min(512, z.length - off)
      writeChunk(out, "IDAT", z, off, n)
      off += n
    }
    writeChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Full pixel-level PNG decode for 8-bit grayscale (color type 0),
    * truecolor (2), palette (3 — PLTE triples folded to a luma LUT,
    * out-of-range indices quarantined), gray+alpha (4) and
    * truecolor+alpha (6), pure JVM: chunk walk with
    * CRC-32 verification on every chunk (unlike the header-only
    * [[parsePng]] — a pixel consumer must reject bit rot), IDAT
    * concatenation, zlib inflate ([[java.util.zip.Inflater]]),
    * bpp-aware per-row unfiltering of all five PNG filter types
    * ("left" is bpp bytes back, spec §9.2), and reduction of color
    * pixels to 8-bit luma with the INTEGER BT.601-shaped weights
    * `(77·R + 150·G + 29·B) >> 8` — the weights sum to exactly 256, so
    * a gray image stored as RGB round-trips bit-identically and the
    * formula replays exactly in any SQL engine (the q_image_phash
    * oracle); gray+alpha luma is the gray channel itself. Alpha is
    * ignored (assets are treated as opaque). Returns
    * None on ANY structural defect — bad signature, unsupported format
    * (bit depth ≠ 8, palette color type, interlace), CRC
    * mismatch, truncated/corrupt deflate stream, wrong decompressed
    * size, unknown filter type — so a curation pipeline quarantines the
    * asset rather than training on garbage pixels.
    */
  def decodePngPixels(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 8) return None
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return None; i += 1 }
    var w = -1; var h = -1; var bpp = -1
    var isPalette = false
    var paletteLuma: Array[Byte] = null // (77R+150G+29B)>>8 per PLTE entry
    val idat = new java.io.ByteArrayOutputStream()
    var sawIdat = false
    var sawIend = false
    var pos = 8
    while (pos + 12 <= b.length && !sawIend) {
      val len = be32(b, pos)
      // bound-check in Long: a corrupt length near 2^31 is positive as a
      // signed Int but overflows pos + 12 + len, which would let the CRC
      // update below read out of bounds instead of quarantining
      if (len < 0 || len.toLong > b.length.toLong - 12 - pos) return None
      val t = boxType(b, pos + 4)
      val crc = new java.util.zip.CRC32()
      crc.update(b, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, pos + 8 + len)) return None
      t match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(b, pos + 8); h = be32(b, pos + 12)
          if (w <= 0 || h <= 0) return None
          // bit depth 8, color 0/2/3/4/6, no compression/filter/interlace
          // variants: everything else is outside this decoder's contract
          bpp = u8(b, pos + 17) match {
            case 0 => 1 // gray8
            case 2 => 3 // RGB8
            case 3 => isPalette = true; 1 // palette index, PLTE required
            case 4 => 2 // gray8 + alpha
            case 6 => 4 // RGBA8
            case _ => return None
          }
          if (u8(b, pos + 16) != 8 || u8(b, pos + 18) != 0 ||
            u8(b, pos + 19) != 0 || u8(b, pos + 20) != 0) return None
          // a CRC-valid crafted IHDR with huge dims must quarantine, not
          // overflow h*(w*bpp+1) / w*h or allocate gigabytes before the
          // IDAT stream can contradict it
          if (w.toLong * h > MaxDecodePixels ||
            (w.toLong * bpp + 1L) * h > Int.MaxValue) return None
        case "PLTE" if isPalette =>
          // the index→color table: must precede IDAT (spec §4.1.2), be
          // 1–256 whole RGB triples, and appear exactly once. Folded to
          // the luma LUT immediately — the integer weights sum to 256, so
          // the palette lookup replays exactly in the SQL oracle
          if (sawIdat || paletteLuma != null ||
            len == 0 || len % 3 != 0 || len > 768) return None
          paletteLuma = new Array[Byte](len / 3)
          var e = 0
          while (e < len / 3) {
            val r = u8(b, pos + 8 + 3 * e); val g = u8(b, pos + 9 + 3 * e)
            val bl = u8(b, pos + 10 + 3 * e)
            paletteLuma(e) = ((77 * r + 150 * g + 29 * bl) >> 8).toByte
            e += 1
          }
        case "PLTE" => // suggested palette for truecolor: ancillary here
        case "IDAT" => sawIdat = true; idat.write(b, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (!sawIend || w < 0) return None
    if (isPalette && paletteLuma == null) return None // no PLTE: corrupt
    val stride = w * bpp + 1
    val raw = new Array[Byte](h * stride)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        got += n
      }
      if (got != raw.length || !inflater.finished()) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // bytewise unfilter over two reconstructed-row buffers (filters
    // reference raw channel bytes, not luma), then per-pixel luma fold
    val px = new Array[Byte](w * h)
    val prev = new Array[Int](w * bpp)
    val curRow = new Array[Int](w * bpp)
    var y = 0
    while (y < h) {
      val f = u8(raw, y * stride)
      var i = 0
      while (i < w * bpp) {
        val v = u8(raw, y * stride + 1 + i)
        val left = if (i >= bpp) curRow(i - bpp) else 0
        val up = if (y > 0) prev(i) else 0
        val upLeft = if (y > 0 && i >= bpp) prev(i - bpp) else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, upLeft)
          case _ => return None
        }
        curRow(i) = rec & 0xff
        i += 1
      }
      var x = 0
      while (x < w) {
        val l =
          if (isPalette) {
            val idx = curRow(x)
            // an index past the palette is corruption, not black pixels
            if (idx >= paletteLuma.length) return None
            paletteLuma(idx) & 0xff
          }
          else if (bpp == 1) curRow(x)
          else if (bpp == 2) curRow(x * 2) // gray+alpha: luma IS the gray channel
          else {
            val o = x * bpp
            (77 * curRow(o) + 150 * curRow(o + 1) + 29 * curRow(o + 2)) >> 8
          }
        px(y * w + x) = l.toByte
        x += 1
      }
      System.arraycopy(curRow, 0, prev, 0, w * bpp)
      y += 1
    }
    Some(PixelImage(w, h, px))
  }

  // ------------------------------------------------------- synthesizers

  /** A structurally-valid PNG prefix (signature + IHDR + CRC filler +
    * payload filler): enough container for any header parser; the pixel
    * data is deterministic filler, not a real zlib stream.
    */
  def pngHeader(w: Int, h: Int, colorType: Int,
      payload: Array[Byte] = Array.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    out.write(Array[Byte](0, 0, 0, 13), 0, 4) // IHDR length
    out.write('I'); out.write('H'); out.write('D'); out.write('R')
    writeBe32(out, w); writeBe32(out, h)
    out.write(8) // bit depth
    out.write(colorType)
    out.write(0); out.write(0); out.write(0) // compression/filter/interlace
    writeBe32(out, 0) // CRC filler (header parsers do not verify CRC)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** A structurally-valid JPEG prefix: SOI, a JFIF APP0 segment (so the
    * parser must actually WALK markers, not read a fixed offset), then
    * SOF0 with the dimensions, then filler payload.
    */
  def jpegHeader(w: Int, h: Int, nComp: Int,
      payload: Array[Byte] = Array.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    writeBe16(out, 16)
    "JFIF".foreach(c => out.write(c.toInt)); out.write(0)
    out.write(1); out.write(1) // version
    out.write(0) // density units
    writeBe16(out, 72); writeBe16(out, 72)
    out.write(0); out.write(0) // no thumbnail
    out.write(0xff); out.write(0xc0) // SOF0
    writeBe16(out, 8 + 3 * nComp)
    out.write(8) // precision
    writeBe16(out, h); writeBe16(out, w)
    out.write(nComp)
    (1 to nComp).foreach { c =>
      out.write(c); out.write(0x11); out.write(0) // id, sampling, qtable
    }
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** A structurally-valid MP4: ftyp + moov(mvhd + one trak/tkhd per
    * track) + mdat(payload). `tracks` are (width, height) pairs — use
    * (0, 0) for an audio-like track. `version` selects the mvhd/tkhd
    * box version (0: 32-bit times, 1: 64-bit) so the parser's both
    * branches are exercisable; dims are written 16.16 fixed point.
    */
  def mp4Header(timescale: Int, duration: Long, tracks: Seq[(Int, Int)],
      payload: Array[Byte] = Array.empty, version: Int = 0): Array[Byte] = {
    require(version == 0 || version == 1, s"mp4 box version $version")
    val out = new java.io.ByteArrayOutputStream()
    // ftyp: major brand + minor version only
    writeBe32(out, 16)
    "ftyp".foreach(c => out.write(c.toInt))
    "isom".foreach(c => out.write(c.toInt))
    writeBe32(out, 0)
    val mvhdPayload = if (version == 0) 100 else 112
    val tkhdPayload = if (version == 0) 84 else 96
    val trakSize = 8 + 8 + tkhdPayload
    writeBe32(out, 8 + 8 + mvhdPayload + tracks.size * trakSize) // moov
    "moov".foreach(c => out.write(c.toInt))
    writeBe32(out, 8 + mvhdPayload) // mvhd
    "mvhd".foreach(c => out.write(c.toInt))
    out.write(version); out.write(0); out.write(0); out.write(0) // flags
    val writeTime: Long => Unit =
      if (version == 0) t => writeBe32(out, t.toInt)
      else t => { writeBe32(out, (t >>> 32).toInt); writeBe32(out, t.toInt) }
    writeTime(0); writeTime(0) // ctime, mtime
    writeBe32(out, timescale)
    writeTime(duration)
    writeBe32(out, 0x00010000) // rate 1.0
    out.write(1); out.write(0) // volume 1.0
    (1 to 10).foreach(_ => out.write(0)) // reserved
    writeMatrix(out)
    (1 to 24).foreach(_ => out.write(0)) // pre_defined
    writeBe32(out, tracks.size + 1) // next_track_ID
    tracks.zipWithIndex.foreach { case ((w, h), ti) =>
      writeBe32(out, trakSize)
      "trak".foreach(c => out.write(c.toInt))
      writeBe32(out, 8 + tkhdPayload)
      "tkhd".foreach(c => out.write(c.toInt))
      out.write(version); out.write(0); out.write(0); out.write(3) // enabled
      writeTime(0); writeTime(0) // ctime, mtime
      writeBe32(out, ti + 1) // track_ID
      writeBe32(out, 0) // reserved
      writeTime(duration)
      (1 to 8).foreach(_ => out.write(0)) // reserved
      (1 to 8).foreach(_ => out.write(0)) // layer/altgroup/volume/reserved
      writeMatrix(out)
      writeBe32(out, w << 16); writeBe32(out, h << 16) // 16.16
    }
    writeBe32(out, 8 + payload.length) // mdat
    "mdat".foreach(c => out.write(c.toInt))
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** A structurally-valid PCM WAV: RIFF/WAVE + optional odd-sized
    * `LIST` junk chunk (so the parser must walk AND word-align, not
    * read fixed offsets) + `fmt ` + `data` with nSamples·blockAlign
    * deterministic filler bytes. blockAlign/byteRate are derived
    * consistently; corruption is synthesized by the CALLER (truncation,
    * or parameters that violate the consistency rules).
    */
  def wavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Long, junkChunk: Boolean = false,
      fill: Byte = 0): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = (nSamples * blockAlign).toInt
    val junk = if (junkChunk) 8 + 5 + 1 else 0 // odd payload + pad byte
    val out = new java.io.ByteArrayOutputStream()
    "RIFF".foreach(c => out.write(c.toInt))
    writeLe32(out, 4 + junk + (8 + 16) + (8 + dataSize))
    "WAVE".foreach(c => out.write(c.toInt))
    if (junkChunk) {
      "LIST".foreach(c => out.write(c.toInt))
      writeLe32(out, 5) // odd size: exercises the pad-byte rule
      "INFOx".foreach(c => out.write(c.toInt))
      out.write(0) // pad to even
    }
    "fmt ".foreach(c => out.write(c.toInt))
    writeLe32(out, 16)
    writeLe16(out, 1) // PCM
    writeLe16(out, channels)
    writeLe32(out, sampleRate)
    writeLe32(out, sampleRate * blockAlign)
    writeLe16(out, blockAlign)
    writeLe16(out, bitsPerSample)
    "data".foreach(c => out.write(c.toInt))
    writeLe32(out, dataSize)
    (0 until dataSize).foreach(_ => out.write(fill))
    out.toByteArray
  }

  /** Encode 16-bit signed mono PCM as a complete WAV (RIFF + fmt +
    * data, little-endian samples) — the audio twin of [[pngGray]]: a
    * real container around real content bytes, so the decode path is
    * exercised by round-trip rather than trusted.
    */
  def wavPcm16Mono(sampleRate: Int, nSamples: Int,
      sample: Int => Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0, s"wavPcm16Mono $sampleRate/$nSamples")
    val dataSize = nSamples * 2
    val out = new java.io.ByteArrayOutputStream()
    "RIFF".foreach(c => out.write(c.toInt))
    writeLe32(out, 4 + (8 + 16) + (8 + dataSize))
    "WAVE".foreach(c => out.write(c.toInt))
    "fmt ".foreach(c => out.write(c.toInt))
    writeLe32(out, 16)
    writeLe16(out, 1) // PCM
    writeLe16(out, 1) // mono
    writeLe32(out, sampleRate)
    writeLe32(out, sampleRate * 2)
    writeLe16(out, 2) // block align
    writeLe16(out, 16)
    "data".foreach(c => out.write(c.toInt))
    writeLe32(out, dataSize)
    var s = 0
    while (s < nSamples) {
      val v = sample(s)
      require(v >= -32768 && v <= 32767, s"sample $s out of s16 range: $v")
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      s += 1
    }
    out.toByteArray
  }

  // ----------------------------------------------- MP4 raw-luma codec

  /** A decoded raw-luma video: frame `f`'s pixel `i` is
    * `px(f * width * height + i)` — 8-bit gray, row-major within the
    * frame (stored as a signed byte; mask with `& 0xff`).
    */
  final case class LumaVideo(width: Int, height: Int, nFrames: Int,
      px: Array[Byte])

  /** Encode raw 8-bit luma frames as a complete MP4 (ftyp + moov with
    * real mvhd/tkhd boxes + ONE mdat holding nFrames·w·h gray8 bytes,
    * frame-major) — the video twin of [[wavPcm16Mono]]/[[pngGray]]: a
    * real container around real content bytes, so the decode path is
    * exercised by round-trip rather than trusted. Timing metadata is
    * 25 fps on the 600-unit timescale (24 units per frame), so the
    * mvhd duration stays consistent with the frame count.
    */
  def mp4LumaVideo(w: Int, h: Int, nFrames: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"mp4LumaVideo ${w}x$h x$nFrames")
    val frameLen = w * h
    val payload = new Array[Byte](nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      var i = 0
      while (i < frameLen) {
        val v = pixel(f, i)
        require(v >= 0 && v <= 255, s"pixel ($f,$i) out of gray8 range: $v")
        payload(f * frameLen + i) = v.toByte
        i += 1
      }
      f += 1
    }
    mp4Header(timescale = 600, duration = nFrames.toLong * 24,
      tracks = Seq((w, h)), payload = payload)
  }

  /** Decode a raw-luma MP4 back to its frames — the video twin of
    * [[decodePngPixels]]/[[decodeWavPcm16Mono]]: the full metadata box
    * walk first ([[parseMp4]] — structural validation, video-track
    * dims), then a top-level walk to the single `mdat`, whose payload
    * must hold a WHOLE number of width·height gray8 frames. None on
    * ANY structural defect — unparseable boxes, missing or ambiguous
    * (second) mdat, ragged frame payload, a crafted container past the
    * pixel budget — so a curation pipeline quarantines the asset
    * instead of fingerprinting garbage frames.
    */
  def decodeMp4Luma(b: Array[Byte]): Option[LumaVideo] = {
    val hdr = parseMp4(b).getOrElse(return None)
    val w = hdr.width; val h = hdr.height
    var mdat: Option[(Int, Int)] = None
    var dup = false
    if (!walkBoxes(b, 0, b.length) { (t, s, e) =>
      if (t == "mdat") {
        if (mdat.isDefined) dup = true else mdat = Some((s, e))
      }
    }) return None
    if (dup) return None // ambiguous container: which payload is real?
    val (ms, me) = mdat.getOrElse(return None)
    val size = (me - ms).toLong
    val frameLen = w.toLong * h
    if (size == 0 || size % frameLen != 0) return None
    if (size > MaxDecodePixels) return None // same budget as the PNG path
    val n = (size / frameLen).toInt
    Some(LumaVideo(w, h, n, java.util.Arrays.copyOfRange(b, ms, me)))
  }

  /** Decode a 16-bit signed mono PCM WAV to its sample array — the
    * audio twin of [[decodePngPixels]]: RIFF/fmt/data chunk walk (odd
    * sizes padded per spec), format contract enforced (PCM, 1 channel,
    * 16 bits), and None on ANY structural defect — truncated container,
    * data chunk whose declared size exceeds the available bytes, or an
    * out-of-contract format — so a curation pipeline quarantines the
    * asset instead of fingerprinting garbage.
    */
  def decodeWavPcm16Mono(b: Array[Byte]): Option[Array[Int]] = {
    if (b.length < 12) return None
    if (boxType(b, 0) != "RIFF" || boxType(b, 8) != "WAVE") return None
    var pos = 12
    var fmtOk = false
    var samples: Array[Int] = null
    while (pos + 8 <= b.length) {
      val id = boxType(b, pos)
      val size = le32(b, pos + 4)
      if (size < 0 || size.toLong > b.length.toLong - 8 - pos) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val codec = le16(b, pos + 8)
          val channels = le16(b, pos + 10)
          val bits = le16(b, pos + 22)
          if (codec != 1 || channels != 1 || bits != 16) return None
          fmtOk = true
        case "data" =>
          // a second 'data' chunk is an ambiguous container — reject like
          // every other structural defect instead of letting it silently
          // overwrite the first (the reject-on-defect contract)
          if (!fmtOk || size % 2 != 0 || samples != null) return None
          val n = size / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) = (u8(b, pos + 8 + 2 * i) |
              (u8(b, pos + 9 + 2 * i) << 8)).toShort.toInt
            i += 1
          }
          samples = out
        case _ => // LIST/JUNK etc: skip
      }
      pos += 8 + size + (size & 1) // odd chunk sizes pad to even
    }
    Option(samples)
  }

  private def writeLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def writeLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }

  private def writeMatrix(o: java.io.ByteArrayOutputStream): Unit = {
    // identity: 0x00010000, 0, 0 / 0, 0x00010000, 0 / 0, 0, 0x40000000
    val m = Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    m.foreach(writeBe32(o, _))
  }

  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeBe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }

  // ===== Baseline JPEG, grayscale (ITU-T T.81 / JFIF) ==================
  //
  // A from-scratch SEQUENTIAL-BASELINE codec for the one-component
  // (luma) case: real forward/inverse DCT, real canonical-Huffman
  // entropy coding with 0xFF byte stuffing, DC prediction, zigzag,
  // quantization. The encoder declares its own tables in DQT/DHT —
  // quantization all-ones (so block-constant "mosaic" pixels round-trip
  // EXACTLY: a constant block is DC-only, DC = 8·(v−128) is integer,
  // and the DC-only inverse is v again), and canonical Huffman tables
  // derived from two one-line BITS specs (12 DC categories at length 4,
  // all 162 AC symbols at length 8 — Kraft-valid, built by the T.81
  // code-assignment algorithm rather than transcribed constants).
  // The decoder reads whatever tables the stream declares, so it
  // decodes third-party baseline grayscale JPEGs too, not just its
  // sibling's output.

  /** Zigzag order: ZigZag(i) = raster index of the i-th zigzag coeff. */
  private val ZigZag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    var x = 0; var y = 0; var up = true
    while (i < 64) {
      out(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    out
  }

  /** Canonical Huffman code assignment (T.81 Annex C): BITS(l) codes of
    * length l+1, values in HUFFVAL order → (code, length) per value.
    */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var n = 0
      while (n < bits(l - 1)) {
        out(vals(k)) = (code, l)
        code += 1; k += 1; n += 1
      }
      code <<= 1
      l += 1
    }
    out.toMap
  }

  /** The encoder's own tables: 12 DC size categories at code length 4;
    * all 162 baseline AC (run, size) symbols at code length 8. Both
    * Kraft-complete enough (12/16, 162/256) to be valid prefix codes.
    */
  private val JpegDcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals: Array[Int] = (0 to 11).toArray
  private val JpegAcVals: Array[Int] = {
    val syms = scala.collection.mutable.ArrayBuffer(0x00, 0xf0) // EOB, ZRL
    for (run <- 0 to 15; size <- 1 to 10) syms += ((run << 4) | size)
    syms.sorted.toArray // 162 symbols, ascending for determinism
  }
  private val JpegAcBits: Array[Int] = {
    val b = new Array[Int](16); b(7) = JpegAcVals.length; b
  }

  /** The color encoder's CHROMA tables (DHT ids 1): same BITS shape,
    * HUFFVAL reversed — a different (still canonical) code↔symbol
    * assignment, so a decoder that misroutes a chroma block to the luma
    * tables reads garbage symbols instead of silently agreeing. Distinct
    * CONTENT is what makes the SOS table-id routing testable (the first
    * cut duplicated the luma tables under id 1, which exercised nothing).
    */
  private val JpegDcValsChroma: Array[Int] = JpegDcVals.reverse
  private val JpegAcValsChroma: Array[Int] = JpegAcVals.reverse

  private class BitWriter(o: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          o.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) o.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nbits > 0) { put((1 << (8 - nbits)) - 1, 8 - nbits) }
  }

  /** Magnitude category (T.81 "SSSS") and the SSSS-bit two's-ish
    * representation of v (negative values are encoded as v − 1 in SSSS
    * bits, per the EXTEND convention).
    */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** cos((2x+1)·u·π/16) — the one table both transforms read; computing
    * it per sample made the first cut of this codec ~100× slower (the
    * 8,192 math.cos calls per block dominated both bench queries).
    */
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val DctC: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Separable forward DCT: an 8-point row pass then an 8-point column
    * pass (2·8³ multiplies per block instead of the naive 64²-sample
    * quadruple loop). Block-constant inputs stay exact: every AC term
    * folds the same ±cos values whose float sum is ~1e-14, rounding to
    * 0 at quantization, and DC is a sum of identical doubles.
    */
  private def fdct8(block: Array[Double]): Array[Double] = {
    val t = new Array[Double](64) // t(y*8+u) = Σ_x block(y,x)·cos(u,x)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * DctCos(u)(x); x += 1 }
        t(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += t(yy * 8 + u) * DctCos(v)(yy); yy += 1 }
        out(v * 8 + u) = 0.25 * DctC(u) * DctC(v) * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Separable inverse DCT (same table, same 2·8³ shape). */
  private def idct8(coef: Array[Double]): Array[Double] = {
    val g = new Array[Double](64) // g(v*8+x) = Σ_u cu·F(v,u)·cos(u,x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += DctC(u) * coef(v * 8 + u) * DctCos(u)(x); u += 1 }
        g(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += DctC(vv) * g(vv * 8 + x) * DctCos(vv)(y); vv += 1 }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  /** Forward-transform, quantize (zigzag, against `qtab`) and
    * entropy-code ONE 8×8 block of level-shifted samples; returns the
    * new DC predictor. The one block writer both the grayscale and the
    * color encoder share — per-component tables arrive as arguments.
    */
  private def writeBlock(bw: BitWriter, block: Array[Double], pred: Int,
      dcCodes: Map[Int, (Int, Int)], acCodes: Map[Int, (Int, Int)],
      qtab: Array[Int]): Int = {
    val coef = fdct8(block)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) {
      q(i) = math.round(coef(ZigZag(i)) / qtab(i)).toInt
      i += 1
    }
    // DC: category + magnitude bits of the prediction diff
    val diff = q(0) - pred
    val s = category(diff)
    val (dcode, dlen) = dcCodes(s)
    bw.put(dcode, dlen)
    if (s > 0) bw.put(if (diff < 0) diff - 1 + (1 << s) else diff, s)
    // AC: run-length of zeros, ZRL for 16+, EOB for the tail
    var run = 0
    var k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16
        }
        val sz = category(q(k))
        val (ac, al) = acCodes((run << 4) | sz)
        bw.put(ac, al)
        bw.put(if (q(k) < 0) q(k) - 1 + (1 << sz) else q(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
    q(0)
  }

  /** A COMPLETE baseline grayscale JFIF: SOI, APP0, DQT (all-ones, so
    * 8×8-constant pixel functions survive encode→decode EXACTLY), SOF0,
    * the two self-declared DHTs, SOS, real entropy-coded scan, EOI.
    * `w` and `h` must be multiples of 8 (this encoder does not pad
    * partial MCUs; the asset synthesizers use 72×64).
    */
  def jpegGray(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"jpegGray: $w x $h not MCU-aligned")
    val o = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { o.write(0xff); o.write(m) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    writeBe16(o, 16)
    o.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0), 0, 8)
    writeBe16(o, 1); writeBe16(o, 1); o.write(0); o.write(0)
    marker(0xdb) // DQT: table 0, 8-bit, all ones (zigzag order)
    writeBe16(o, 67); o.write(0)
    var i = 0
    while (i < 64) { o.write(1); i += 1 }
    marker(0xc0) // SOF0: 8-bit, 1 component, 1x1 sampling, quant 0
    writeBe16(o, 11); o.write(8)
    writeBe16(o, h); writeBe16(o, w)
    o.write(1); o.write(1); o.write(0x11); o.write(0)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      writeBe16(o, 2 + 1 + 16 + vals.length)
      o.write(cls << 4) // class (0 DC / 1 AC), id 0
      bits.foreach(o.write)
      vals.foreach(o.write)
    }
    dht(0, JpegDcBits, JpegDcVals)
    dht(1, JpegAcBits, JpegAcVals)
    marker(0xda) // SOS
    writeBe16(o, 8); o.write(1); o.write(1); o.write(0x00)
    o.write(0); o.write(63); o.write(0)
    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val acCodes = canonicalCodes(JpegAcBits, JpegAcVals)
    val bw = new BitWriter(o)
    val block = new Array[Double](64)
    val ones = Array.fill(64)(1)
    var pred = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            block(yy * 8 + xx) =
              (pixel(bx * 8 + xx, by * 8 + yy) & 0xff) - 128.0
            xx += 1
          }
          yy += 1
        }
        pred = writeBlock(bw, block, pred, dcCodes, acCodes, ones)
        bx += 1
      }
      by += 1
    }
    bw.flushWithOnes()
    marker(0xd9) // EOI
    o.toByteArray
  }

  /** A COMPLETE baseline COLOR JFIF — the 3-component (YCbCr) sibling
    * of [[jpegGray]]: SOF0 with per-component sampling factors
    * (4:2:0 when `subsample`, else 4:4:4), TWO quantization tables
    * (luma all-ones, chroma all-twos — distinct content so table
    * routing is exercised; both keep 8×8-constant planes EXACT:
    * DC = 8·(v−128) is even, so /2 then ×2 round-trips), four DHTs
    * (DC/AC × table id 0/1 — the id-1 chroma tables carry DISTINCT
    * content, [[JpegDcValsChroma]], so SOS table-id routing is a real
    * contract), and a single INTERLEAVED entropy-coded scan — per MCU:
    * the hY×hY luma blocks in raster order, then one Cb and one Cr
    * block, each component with its own DC predictor.
    *
    * Inputs are PLANAR, each component sampled at its OWN resolution
    * (chroma functions take chroma coordinates — ceil(w/2)×ceil(h/2)
    * when subsampled): the synthesizers declare the subsampled signal
    * directly, so no downsampling filter muddies the exactness
    * contract. Partial MCUs (w or h not a multiple of 16 in 4:2:0 —
    * the 72-wide assets) pad by edge replication, per T.81 A.2.4's
    * recommendation; [[decodeJpeg]] crops them away.
    */
  def jpegColor(w: Int, h: Int, yF: (Int, Int) => Int,
      cbF: (Int, Int) => Int, crF: (Int, Int) => Int,
      subsample: Boolean): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"jpegColor: $w x $h not block-aligned")
    val o = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { o.write(0xff); o.write(m) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    writeBe16(o, 16)
    o.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0), 0, 8)
    writeBe16(o, 1); writeBe16(o, 1); o.write(0); o.write(0)
    marker(0xdb) // DQT: two entries in one segment (luma q=1, chroma q=2)
    writeBe16(o, 2 + 65 + 65)
    o.write(0x00); (0 until 64).foreach(_ => o.write(1))
    o.write(0x01); (0 until 64).foreach(_ => o.write(2))
    val hY = if (subsample) 2 else 1
    marker(0xc0) // SOF0: 8-bit, 3 components
    writeBe16(o, 8 + 3 * 3); o.write(8)
    writeBe16(o, h); writeBe16(o, w); o.write(3)
    o.write(1); o.write((hY << 4) | hY); o.write(0) // Y
    o.write(2); o.write(0x11); o.write(1) // Cb
    o.write(3); o.write(0x11); o.write(1) // Cr
    def dht(cls: Int, id: Int): Unit = {
      val (bits, vals) = (cls, id) match {
        case (0, 0) => (JpegDcBits, JpegDcVals)
        case (1, 0) => (JpegAcBits, JpegAcVals)
        case (0, _) => (JpegDcBits, JpegDcValsChroma)
        case _ => (JpegAcBits, JpegAcValsChroma)
      }
      marker(0xc4)
      writeBe16(o, 2 + 1 + 16 + vals.length)
      o.write((cls << 4) | id)
      bits.foreach(o.write)
      vals.foreach(o.write)
    }
    dht(0, 0); dht(1, 0); dht(0, 1); dht(1, 1)
    marker(0xda) // SOS: 3 components, Y→tables 0, chroma→tables 1
    writeBe16(o, 6 + 2 * 3)
    o.write(3)
    o.write(1); o.write(0x00)
    o.write(2); o.write(0x11)
    o.write(3); o.write(0x11)
    o.write(0); o.write(63); o.write(0)
    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val acCodes = canonicalCodes(JpegAcBits, JpegAcVals)
    val dcCodesC = canonicalCodes(JpegDcBits, JpegDcValsChroma)
    val acCodesC = canonicalCodes(JpegAcBits, JpegAcValsChroma)
    val qLuma = Array.fill(64)(1)
    val qChroma = Array.fill(64)(2)
    val bw = new BitWriter(o)
    val block = new Array[Double](64)
    val mcuPx = 8 * hY
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx
    val cw = (w + hY - 1) / hY // chroma plane dims (ceil(w/2) in 4:2:0)
    val ch = (h + hY - 1) / hY
    var predY = 0; var predCb = 0; var predCr = 0
    def fill(f: (Int, Int) => Int, x0: Int, y0: Int, maxX: Int, maxY: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        val gy = math.min(y0 + yy, maxY)
        var xx = 0
        while (xx < 8) {
          block(yy * 8 + xx) = (f(math.min(x0 + xx, maxX), gy) & 0xff) - 128.0
          xx += 1
        }
        yy += 1
      }
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var v = 0
        while (v < hY) {
          var hb = 0
          while (hb < hY) {
            fill(yF, mx * mcuPx + hb * 8, my * mcuPx + v * 8, w - 1, h - 1)
            predY = writeBlock(bw, block, predY, dcCodes, acCodes, qLuma)
            hb += 1
          }
          v += 1
        }
        fill(cbF, mx * 8, my * 8, cw - 1, ch - 1)
        predCb = writeBlock(bw, block, predCb, dcCodesC, acCodesC, qChroma)
        fill(crF, mx * 8, my * 8, cw - 1, ch - 1)
        predCr = writeBlock(bw, block, predCr, dcCodesC, acCodesC, qChroma)
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    marker(0xd9) // EOI
    o.toByteArray
  }

  /** Canonical Huffman DECODING tables (T.81 Annex F): per code length,
    * the smallest/largest code and the HUFFVAL offset.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader: un-stuffs FF00, refuses any other
    * marker mid-scan (no restart-interval support — DRI streams
    * quarantine), reports exhaustion as -1.
    */
  private final class BitReader(b: Array[Byte], var pos: Int, until: Int) {
    private var acc = 0
    private var nbits = 0
    var badMarker = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= until) return -1
        var v = u8(b, pos); pos += 1
        if (v == 0xff) {
          if (pos >= until) return -1
          val m = u8(b, pos)
          if (m == 0x00) pos += 1 // stuffed data byte
          else { badMarker = true; return -1 }
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val x = bit(); if (x < 0) return -1
        v = (v << 1) | x; i += 1
      }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        val x = bit(); if (x < 0) return -1
        code = (code << 1) | x
        l += 1
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.huffVal(t.valPtr(l) + code - t.minCode(l))
      }
      -1 // code longer than any declared length: corrupt
    }
  }

  /** EXTEND (T.81 F.2.2.1): a SSSS-bit magnitude back to its signed
    * value.
    */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Integer YCbCr→RGB (JFIF full-range, 16-bit fixed point with FLOOR
    * division — `>>` is an arithmetic shift) folded straight into the
    * pipeline's standard luma recipe (77·R + 150·G + 29·B) >> 8, the
    * same weights the color-PNG path uses — a color JPEG and a color
    * PNG of the same scene fingerprint identically. The SQL oracle
    * replays the floor divisions exactly via the bias-then-divide
    * identity (add 2²⁴, divide, subtract 256 — the numerator stays
    * non-negative, where floor and truncating division agree).
    */
  private def ycbcrLuma(y: Int, cb: Int, cr: Int): Int = {
    val cbd = cb - 128; val crd = cr - 128
    def clamp(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val r = clamp(y + ((91881 * crd) >> 16)) // 1.402 · 2¹⁶
    val g = clamp(y - ((22554 * cbd + 46802 * crd) >> 16)) // .344/.714 · 2¹⁶
    val b = clamp(y + ((116130 * cbd) >> 16)) // 1.772 · 2¹⁶
    (77 * r + 150 * g + 29 * b) >> 8
  }

  /** Full baseline JPEG decode to 8-bit LUMA pixels: marker walk
    * (DQT/DHT/SOF0/SOS; APPn/COM skipped), canonical-Huffman entropy
    * decode with per-component DC prediction and FF00 un-stuffing,
    * dequantize, dezigzag, inverse DCT, level shift, clamp.
    *
    * Grayscale (1 component, 1×1) decodes as before; 3-component YCbCr
    * streams decode the INTERLEAVED MCU scan — per MCU the hY×vY luma
    * blocks in raster order then one Cb and one Cr block, each
    * component routed to its OWN quantization and DC/AC Huffman tables
    * — with 4:4:4 (all 1×1) and 4:2:0 (luma 2×2, chroma 1×1) sampling;
    * chroma upsamples by replication (pixel (x,y) reads chroma
    * (x/hY, y/vY)) and folds through [[ycbcrLuma]]. Partial MCUs
    * (the 72-wide 4:2:0 assets) decode into padded planes and crop to
    * the frame dims.
    *
    * Returns None on ANY structural defect — wrong signature,
    * progressive/arithmetic/12-bit streams, other sampling layouts
    * (4:2:2, CMYK), missing tables, truncated entropy data, an
    * unexpected marker mid-scan, a scan not closed by EOI, oversized
    * dims — so a curation pipeline quarantines rather than training on
    * garbage pixels.
    */
  def decodeJpeg(b: Array[Byte]): Option[PixelImage] =
    decodeJpegImpl(b).map(_._2)

  /** [[decodeJpeg]] restricted to single-component (grayscale) streams
    * — the original quarantine contract for callers that must REJECT
    * color rather than fold it to luma.
    */
  def decodeJpegGray(b: Array[Byte]): Option[PixelImage] =
    decodeJpegImpl(b).collect { case (1, img) => img }

  private def decodeJpegImpl(b: Array[Byte]): Option[(Int, PixelImage)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var pos = 2
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val huff = scala.collection.mutable.Map.empty[(Int, Int), HuffTable]
    var w = -1; var h = -1
    var nc = 0
    val compId = new Array[Int](3); val compH = new Array[Int](3)
    val compV = new Array[Int](3); val compTq = new Array[Int](3)
    val compTd = new Array[Int](3); val compTa = new Array[Int](3)
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > b.length) return None
      if (u8(b, pos) != 0xff) return None
      val m = u8(b, pos + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 } // bare markers
      else if (m == 0xd9) return None // EOI before any scan
      else {
        val len = be16(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        m match {
          case 0xdb => // DQT: one or more (Pq/Tq, 64 values) entries
            var p = seg
            while (p < segEnd) {
              if (u8(b, p) >> 4 != 0) return None // 16-bit tables: reject
              if (p + 65 > segEnd) return None
              val id = u8(b, p) & 0x0f
              quant(id) = Array.tabulate(64)(i => u8(b, p + 1 + i))
              p += 65
            }
          case 0xc4 => // DHT: one or more (Tc/Th, BITS, HUFFVAL) entries
            var p = seg
            while (p < segEnd) {
              if (p + 17 > segEnd) return None
              val cls = u8(b, p) >> 4
              val id = u8(b, p) & 0x0f
              if (cls > 1) return None
              val bits = Array.tabulate(16)(i => u8(b, p + 1 + i))
              val n = bits.sum
              if (n == 0 || n > 256 || p + 17 + n > segEnd) return None
              val vals = Array.tabulate(n)(i => u8(b, p + 17 + i))
              huff((cls, id)) = new HuffTable(bits, vals)
              p += 17 + n
            }
          case 0xc0 => // SOF0 — baseline sequential only
            // 6 header bytes + 3 per component: shorter segments would
            // read past segEnd (and, at buffer end, past the array)
            if (len < 9) return None
            if (u8(b, seg) != 8) return None // 12-bit: reject
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels)
              return None
            nc = u8(b, seg + 5)
            if (nc != 1 && nc != 3) return None // gray or YCbCr only
            if (len < 8 + 3 * nc) return None
            var i = 0
            while (i < nc) {
              compId(i) = u8(b, seg + 6 + 3 * i)
              val hv = u8(b, seg + 7 + 3 * i)
              compH(i) = hv >> 4; compV(i) = hv & 0x0f
              compTq(i) = u8(b, seg + 8 + 3 * i)
              i += 1
            }
            // sampling contract: gray 1×1; color 4:4:4 or 4:2:0 —
            // anything else (4:2:2, 4:1:1, …) quarantines
            if (nc == 1) {
              if (compH(0) != 1 || compV(0) != 1) return None
            } else {
              val yOk = (compH(0) == 1 && compV(0) == 1) ||
                (compH(0) == 2 && compV(0) == 2)
              if (!yOk || compH(1) != 1 || compV(1) != 1 ||
                compH(2) != 1 || compV(2) != 1) return None
            }
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
              0xcb | 0xcd | 0xce | 0xcf =>
            return None // extended/progressive/lossless/arithmetic
          case 0xdd => return None // restart intervals: out of contract
          case 0xda => // SOS — single interleaved scan of every component
            if (w < 0) return None // scan before frame header
            if (len < 6 + 2 * nc) return None
            if (u8(b, seg) != nc) return None
            var i = 0
            while (i < nc) {
              // scan components in frame order (T.81 interleaved layout)
              if (u8(b, seg + 1 + 2 * i) != compId(i)) return None
              compTd(i) = u8(b, seg + 2 + 2 * i) >> 4
              compTa(i) = u8(b, seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            scanStart = segEnd
          case _ => // APPn / COM / others: skip
        }
        pos = segEnd
      }
    }
    // resolve per-component tables once, before the MCU loop
    val qs = new Array[Array[Int]](nc)
    val dcs = new Array[HuffTable](nc)
    val acs = new Array[HuffTable](nc)
    var ci0 = 0
    while (ci0 < nc) {
      qs(ci0) = quant.getOrElse(compTq(ci0), return None)
      dcs(ci0) = huff.getOrElse((0, compTd(ci0)), return None)
      acs(ci0) = huff.getOrElse((1, compTa(ci0)), return None)
      ci0 += 1
    }
    val hY = compH(0); val vY = compV(0)
    val mcusX = (w + 8 * hY - 1) / (8 * hY)
    val mcusY = (h + 8 * vY - 1) / (8 * vY)
    // per-component planes padded to whole MCUs; cropped at the end
    val pw = new Array[Int](nc); val planes = new Array[Array[Byte]](nc)
    var ci1 = 0
    while (ci1 < nc) {
      val cw = mcusX * 8 * compH(ci1)
      val chh = mcusY * 8 * compV(ci1)
      pw(ci1) = cw
      planes(ci1) = new Array[Byte](cw * chh)
      ci1 += 1
    }
    val br = new BitReader(b, scanStart, b.length)
    val coef = new Array[Double](64)
    val preds = new Array[Int](nc)
    // one entropy-decoded, dequantized, inverse-transformed block of
    // component `ci` into its plane at block position (bx, by); false
    // on any entropy-layer defect (the caller quarantines)
    def block(ci: Int, bx: Int, by: Int): Boolean = {
      val q = qs(ci)
      java.util.Arrays.fill(coef, 0.0)
      val s = br.decode(dcs(ci))
      if (s < 0 || s > 11) return false
      val dbits = if (s == 0) 0 else br.bits(s)
      if (dbits < 0) return false
      preds(ci) += extend(dbits, s)
      coef(0) = preds(ci).toDouble * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = br.decode(acs(ci))
        if (rs < 0) return false
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) k += 16
        else {
          val run = rs >> 4
          val sz = rs & 0x0f
          k += run
          if (k > 63) return false
          val mbits = br.bits(sz)
          if (mbits < 0) return false
          coef(ZigZag(k)) = extend(mbits, sz).toDouble * q(k)
          k += 1
        }
      }
      if (k > 64) return false
      val out = idct8(coef)
      val plane = planes(ci); val stride = pw(ci)
      var yy = 0
      while (yy < 8) {
        val base = (by * 8 + yy) * stride + bx * 8
        var xx = 0
        while (xx < 8) {
          val v = math.round(out(yy * 8 + xx) + 128.0).toInt
          plane(base + xx) =
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          xx += 1
        }
        yy += 1
      }
      true
    }
    var failed = false
    var my = 0
    while (my < mcusY && !failed) {
      var mx = 0
      while (mx < mcusX && !failed) {
        var v = 0
        while (v < vY && !failed) {
          var hb = 0
          while (hb < hY && !failed) {
            failed = !block(0, mx * hY + hb, my * vY + v)
            hb += 1
          }
          v += 1
        }
        var ci = 1
        while (ci < nc && !failed) {
          failed = !block(ci, mx, my)
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    if (failed || br.badMarker) return None
    // structural completeness: the scan must be CLOSED by EOI (the
    // PNG path's IEND discipline) — a stream cut after the last MCU's
    // bits is still a truncated file and quarantines. At most one
    // padding byte (stuffed if it is 0xFF) may sit before the marker.
    var p = br.pos
    if (!(p + 2 <= b.length && u8(b, p) == 0xff && u8(b, p + 1) == 0xd9)) {
      if (p < b.length && u8(b, p) == 0xff) {
        if (p + 1 < b.length && u8(b, p + 1) == 0x00) p += 2 else return None
      } else p += 1
    }
    if (p + 2 > b.length || u8(b, p) != 0xff || u8(b, p + 1) != 0xd9)
      return None
    val px = new Array[Byte](w * h)
    if (nc == 1) {
      val plane = planes(0); val stride = pw(0)
      var y = 0
      while (y < h) {
        System.arraycopy(plane, y * stride, px, y * w, w)
        y += 1
      }
    } else {
      val yP = planes(0); val yStride = pw(0)
      val cbP = planes(1); val crP = planes(2); val cStride = pw(1)
      var y = 0
      while (y < h) {
        val cRow = (y / vY) * cStride
        var x = 0
        while (x < w) {
          val c = cRow + x / hY
          px(y * w + x) = ycbcrLuma(yP(y * yStride + x) & 0xff,
            cbP(c) & 0xff, crP(c) & 0xff).toByte
          x += 1
        }
        y += 1
      }
    }
    Some((nc, PixelImage(w, h, px)))
  }
}
