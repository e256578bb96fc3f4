package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Header-parser correctness against HAND-PINNED real container bytes
  * (independent of the synthesizers, so a symmetric encode/decode bug
  * cannot cancel out), plus round-trip and corruption behavior.
  */
class MediaCodecSpec extends AnyFunSuite {

  // A real minimal PNG header: 1×1 truecolor-alpha (colorType 6), as
  // emitted by standard encoders — signature + IHDR with its true CRC.
  private val realPng1x1: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
    0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R', // len 13, "IHDR"
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // width 1, height 1
    0x08, 0x06, 0x00, 0x00, 0x00, // depth 8, color 6, c/f/i
    0x1f, 0x15, 0xc4, 0x89 // true IHDR CRC
  ).map(_.toByte)

  // A real JPEG/JFIF prefix: SOI, APP0 (16-byte JFIF), SOF0 declaring
  // 8×16, 3 components — the standard baseline layout.
  private val realJpeg8x16: Array[Byte] = Array(
    0xff, 0xd8, // SOI
    0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
    0x01, 0x01, 0x00, 0x00, 0x48, 0x00, 0x48, 0x00, 0x00, // APP0
    0xff, 0xc0, 0x00, 0x11, 0x08, // SOF0, len 17, precision 8
    0x00, 0x10, // height 16
    0x00, 0x08, // width 8
    0x03, // 3 components
    0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01
  ).map(_.toByte)

  test("parses a real PNG IHDR (pinned bytes, not synthesized)") {
    assert(MediaCodec.decodeHeader(realPng1x1) ==
      Some(MediaCodec.ImageHeader("png", 1, 1, 4)))
  }

  test("parses a real JPEG SOF0 behind an APP0 segment (pinned bytes)") {
    assert(MediaCodec.decodeHeader(realJpeg8x16) ==
      Some(MediaCodec.ImageHeader("jpeg", 8, 16, 3)))
  }

  test("png synthesize -> parse round-trips dims and channels") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val b = MediaCodec.pngHeader(640, 480, ct, Array[Byte](1, 2, 3))
      assert(MediaCodec.decodeHeader(b) ==
        Some(MediaCodec.ImageHeader("png", 640, 480, ch)), s"colorType=$ct")
    }
  }

  test("jpeg synthesize -> parse round-trips dims and components") {
    for (nc <- Seq(1, 3, 4)) {
      val b = MediaCodec.jpegHeader(1920, 1080, nc, Array[Byte](9))
      assert(MediaCodec.decodeHeader(b) ==
        Some(MediaCodec.ImageHeader("jpeg", 1920, 1080, nc)), s"nComp=$nc")
    }
  }

  test("progressive JPEG (SOF2) parses; dimensions at 16-bit extremes") {
    // swap the synthesized SOF0 marker for SOF2 — the walk must accept
    // any dimension-carrying SOFn
    val b = MediaCodec.jpegHeader(65535, 1, 3)
    val sofAt = b.indexOfSlice(Array[Byte](0xff.toByte, 0xc0.toByte), 2)
    b(sofAt + 1) = 0xc2.toByte
    assert(MediaCodec.decodeHeader(b) ==
      Some(MediaCodec.ImageHeader("jpeg", 65535, 1, 3)))
  }

  test("corrupt and truncated inputs return None, never throw") {
    assert(MediaCodec.decodeHeader(Array.empty[Byte]).isEmpty)
    assert(MediaCodec.decodeHeader("not an image at all".getBytes).isEmpty)
    assert(MediaCodec.decodeHeader(realPng1x1.take(20)).isEmpty)
    assert(MediaCodec.decodeHeader(realJpeg8x16.take(21)).isEmpty)
    // PNG signature with a non-IHDR first chunk
    val badChunk = realPng1x1.clone(); badChunk(12) = 'X'.toByte
    assert(MediaCodec.decodeHeader(badChunk).isEmpty)
    // JPEG marker desync (garbage where a marker should be)
    val desync = realJpeg8x16.clone(); desync(2) = 0x00.toByte
    assert(MediaCodec.decodeHeader(desync).isEmpty)
    // unknown PNG color type
    val badCt = MediaCodec.pngHeader(4, 4, colorType = 5)
    assert(MediaCodec.decodeHeader(badCt).isEmpty)
  }

  // --------------------------------------------------- PNG pixel codec

  // A complete 6×4 gray8 PNG produced by an INDEPENDENT encoder
  // (Python zlib + hand-built chunks; filters 0,1,2,3 across the four
  // rows), pinned byte-for-byte: the Scala decoder must recover the
  // exact pixels from bytes it did not produce, so a symmetric
  // encode/decode bug cannot cancel out.
  private val realPng6x4: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00, 0x0d,
    0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x06, 0x00, 0x00, 0x00, 0x04,
    0x08, 0x00, 0x00, 0x00, 0x00, 0x88, 0x6f, 0x11, 0x9f, 0x00, 0x00, 0x00,
    0x1d, 0x49, 0x44, 0x41, 0x54, 0x78, 0x9c, 0x63, 0xe0, 0x35, 0x0a, 0xaf,
    0x59, 0x78, 0x8c, 0x31, 0x43, 0x15, 0x04, 0x98, 0xa2, 0xc1, 0x80, 0x79,
    0xef, 0x01, 0x07, 0x20, 0x00, 0x00, 0x6f, 0xeb, 0x08, 0x40, 0x87, 0xc1,
    0xdd, 0x7e, 0x00, 0x00, 0x00, 0x00, 0x49, 0x45, 0x4e, 0x44, 0xae, 0x42,
    0x60, 0x82).map(_.toByte)

  // pixel(x, y) = (x*37 + y*91 + 13) % 256, row-major
  private val realPng6x4Pixels: Array[Int] = Array(
    13, 50, 87, 124, 161, 198, 104, 141, 178, 215, 252, 33, 195, 232, 13,
    50, 87, 124, 30, 67, 104, 141, 178, 215)

  test("pixel-decodes an independently-encoded PNG (pinned bytes)") {
    val img = MediaCodec.decodePngPixels(realPng6x4).get
    assert(img.width == 6 && img.height == 4)
    assert(img.px.map(_ & 0xff).toSeq == realPng6x4Pixels.toSeq)
  }

  test("pngGray encode -> decode round-trips exact pixels, all 5 filters") {
    def pix(x: Int, y: Int): Int = (x * x * 7 + y * 31 + x * y) % 256
    val b = MediaCodec.pngGray(23, 17, pix, y => y % 5)
    val img = MediaCodec.decodePngPixels(b).get
    assert(img.width == 23 && img.height == 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert((img.px(y * 23 + x) & 0xff) == pix(x, y), s"($x,$y)")
  }

  test("pngGray splits large streams across IDATs; decoder concatenates") {
    // incompressible-ish pixels so the deflate stream exceeds one
    // 512-byte IDAT slice — a decoder that inflates only the first
    // IDAT fails here
    def pix(x: Int, y: Int): Int = (x * 131 + y * 197 + (x * y * 89) % 251) % 256
    val b = MediaCodec.pngGray(64, 64, pix)
    var count = 0
    for (i <- 0 until b.length - 3)
      if (b(i) == 'I' && b(i + 1) == 'D' && b(i + 2) == 'A' && b(i + 3) == 'T')
        count += 1
    assert(count >= 2, s"expected multi-IDAT, got $count")
    val img = MediaCodec.decodePngPixels(b).get
    for (y <- 0 until 64; x <- 0 until 64)
      assert((img.px(y * 64 + x) & 0xff) == pix(x, y), s"($x,$y)")
  }

  private def patchCrc(b: Array[Byte], chunkStart: Int): Unit = {
    // recompute a chunk's CRC after the test mutates its payload
    def be32(i: Int): Int = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    val len = be32(chunkStart)
    val crc = new java.util.zip.CRC32()
    crc.update(b, chunkStart + 4, 4 + len)
    val v = crc.getValue.toInt
    b(chunkStart + 8 + len) = (v >>> 24).toByte
    b(chunkStart + 9 + len) = (v >>> 16).toByte
    b(chunkStart + 10 + len) = (v >>> 8).toByte
    b(chunkStart + 11 + len) = v.toByte
  }

  test("pixel decode quarantines corruption: truncation, CRC, size lie, color type") {
    val good = MediaCodec.pngGray(8, 8, (x, y) => (x + y * 8) % 256)
    assert(MediaCodec.decodePngPixels(good).isDefined)
    // truncated mid-IDAT
    assert(MediaCodec.decodePngPixels(good.take(40)).isEmpty)
    // single flipped byte in the IDAT payload -> CRC mismatch
    val flipped = good.clone()
    flipped(flipped.length - 20) = (flipped(flipped.length - 20) ^ 0x5a).toByte
    assert(MediaCodec.decodePngPixels(flipped).isEmpty)
    // IHDR claims twice the height (CRC patched to pass): the inflated
    // stream is then too short — the size check must catch the lie
    val tall = good.clone()
    tall(23) = 16.toByte // height low byte (8 -> 16)
    patchCrc(tall, 8)
    assert(MediaCodec.decodePngPixels(tall).isEmpty)
    // a header-only palette container (CRC filler, no PLTE/IDAT) is
    // corrupt even though colorType 3 is now in contract
    assert(MediaCodec.decodePngPixels(
      MediaCodec.pngHeader(4, 4, colorType = 3)).isEmpty)
    // never throws on garbage
    assert(MediaCodec.decodePngPixels("garbage".getBytes).isEmpty)
    assert(MediaCodec.decodePngPixels(Array.empty[Byte]).isEmpty)
  }

  // A complete 5×3 RGB8 PNG produced by an INDEPENDENT encoder (Python
  // zlib + hand-built chunks; filters 0,1,2 across the three rows),
  // pinned byte-for-byte. R=(x·41+y·17+5)%256, G=(x·29+y·83+11)%256,
  // B=(x·59+y·7+23)%256.
  private val realPngRgb5x3: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00, 0x0d,
    0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x05, 0x00, 0x00, 0x00, 0x03,
    0x08, 0x02, 0x00, 0x00, 0x00, 0xd4, 0x54, 0x52, 0xaf, 0x00, 0x00, 0x00,
    0x26, 0x49, 0x44, 0x41, 0x54, 0x78, 0x9c, 0x63, 0x60, 0xe5, 0x16, 0xd7,
    0xd3, 0x08, 0x0a, 0x77, 0xed, 0x6d, 0x48, 0x3a, 0xb1, 0xb2, 0x9e, 0x99,
    0x51, 0x2c, 0x4e, 0x4e, 0x53, 0xd6, 0x1a, 0x8e, 0x98, 0x04, 0x83, 0xd9,
    0x91, 0x11, 0x00, 0x06, 0x6b, 0x09, 0x7e, 0x36, 0x0d, 0x8c, 0xaa, 0x00,
    0x00, 0x00, 0x00, 0x49, 0x45, 0x4e, 0x44, 0xae, 0x42, 0x60, 0x82)
    .map(_.toByte)

  // (77·R + 150·G + 29·B) >> 8 per pixel, row-major
  private val realPngRgb5x3Luma: Array[Int] = Array(
    10, 46, 82, 118, 125, 65, 101, 137, 173, 180, 119, 155, 191, 77, 84)

  test("pixel-decodes an independently-encoded RGB PNG to luma (pinned bytes)") {
    val img = MediaCodec.decodePngPixels(realPngRgb5x3).get
    assert(img.width == 5 && img.height == 3)
    assert(img.px.map(_ & 0xff).toSeq == realPngRgb5x3Luma.toSeq)
  }

  test("pngColor RGB/RGBA encode -> decode round-trips exact luma, all 5 filters") {
    def ch(x: Int, y: Int, c: Int): Int =
      (x * 37 + y * 91 + c * 53 + 13) % 256
    def luma(x: Int, y: Int): Int =
      (77 * ch(x, y, 0) + 150 * ch(x, y, 1) + 29 * ch(x, y, 2)) >> 8
    for (ct <- Seq(2, 6)) {
      val b = MediaCodec.pngColor(23, 17, ct, ch, y => y % 5)
      val img = MediaCodec.decodePngPixels(b).get
      assert(img.width == 23 && img.height == 17)
      for (y <- 0 until 17; x <- 0 until 23)
        assert((img.px(y * 23 + x) & 0xff) == luma(x, y), s"ct=$ct ($x,$y)")
    }
    // alpha never reaches the luma: same RGB, different A, same pixels
    val a0 = MediaCodec.pngColor(9, 7, 6, (x, y, c) =>
      if (c == 3) 0 else ch(x, y, c))
    val a1 = MediaCodec.pngColor(9, 7, 6, (x, y, c) =>
      if (c == 3) (x * y + 200) % 256 else ch(x, y, c))
    assert(MediaCodec.decodePngPixels(a0).get.px.toSeq ==
      MediaCodec.decodePngPixels(a1).get.px.toSeq)
    // gray stored as RGB round-trips bit-identically (weights sum to 256)
    val grayAsRgb = MediaCodec.pngColor(9, 7, 2, (x, y, _) => ch(x, y, 0))
    val gray = MediaCodec.pngGray(9, 7, (x, y) => ch(x, y, 0))
    assert(MediaCodec.decodePngPixels(grayAsRgb).get.px.toSeq ==
      MediaCodec.decodePngPixels(gray).get.px.toSeq)
    // gray+alpha (type 4): luma is the gray channel, alpha ignored —
    // identical pixels to the plain-gray encoding, all 5 filters
    val grayA = MediaCodec.pngColor(9, 7, 4, (x, y, c) =>
      if (c == 1) (x * 3 + y * 5) % 256 else ch(x, y, 0), y => y % 5)
    assert(MediaCodec.decodePngPixels(grayA).get.px.toSeq ==
      MediaCodec.decodePngPixels(gray).get.px.toSeq)
  }

  // A complete 5×3 palette PNG produced by an INDEPENDENT encoder
  // (Python zlib + hand-built chunks; 4-entry PLTE, filters 0,1,2
  // across the rows), pinned byte-for-byte. index(x,y) = (x+y) % 4;
  // palette (255,0,0) (0,255,0) (0,0,128) (10,20,30) → luma LUT
  // (77R+150G+29B)>>8 = 76, 149, 14, 18.
  private val realPngPal5x3: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00, 0x0d,
    0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x05, 0x00, 0x00, 0x00, 0x03,
    0x08, 0x03, 0x00, 0x00, 0x00, 0x6c, 0xe8, 0x35, 0xca, 0x00, 0x00, 0x00,
    0x0c, 0x50, 0x4c, 0x54, 0x45, 0xff, 0x00, 0x00, 0x00, 0xff, 0x00, 0x00,
    0x00, 0x80, 0x0a, 0x14, 0x1e, 0x11, 0xd4, 0x99, 0xce, 0x00, 0x00, 0x00,
    0x16, 0x49, 0x44, 0x41, 0x54, 0x78, 0x9c, 0x63, 0x60, 0x60, 0x64, 0x62,
    0x66, 0x60, 0x04, 0x82, 0xbf, 0x8c, 0x4c, 0x20, 0x82, 0x11, 0x00, 0x0b,
    0x92, 0x02, 0x0c, 0x00, 0x83, 0xd1, 0x91, 0x00, 0x00, 0x00, 0x00, 0x49,
    0x45, 0x4e, 0x44, 0xae, 0x42, 0x60, 0x82).map(_.toByte)

  test("pixel-decodes an independently-encoded palette PNG to luma (pinned bytes)") {
    val img = MediaCodec.decodePngPixels(realPngPal5x3).get
    assert(img.width == 5 && img.height == 3)
    val lut = Array(76, 149, 14, 18)
    assert(img.px.map(_ & 0xff).toSeq ==
      (for (y <- 0 until 3; x <- 0 until 5) yield lut((x + y) % 4)))
  }

  test("pngPalette encode -> decode round-trips exact luma, all 5 filters") {
    val pal = Array.tabulate(256)(i => Array(i, (i * 7 + 3) % 256, (255 - i)))
    def idx(x: Int, y: Int): Int = (x * 37 + y * 91 + 13) % 256
    def luma(i: Int): Int =
      (77 * pal(i)(0) + 150 * pal(i)(1) + 29 * pal(i)(2)) >> 8
    val b = MediaCodec.pngPalette(23, 17, pal, idx, y => y % 5)
    val img = MediaCodec.decodePngPixels(b).get
    assert(img.width == 23 && img.height == 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert((img.px(y * 23 + x) & 0xff) == luma(idx(x, y)), s"($x,$y)")
    // a palette image whose luma equals a gray image decodes identically
    val grayPal = Array.tabulate(256)(i => Array(i, i, i))
    val asPal = MediaCodec.pngPalette(9, 7, grayPal, (x, y) => idx(x, y))
    val asGray = MediaCodec.pngGray(9, 7, (x, y) => idx(x, y))
    assert(MediaCodec.decodePngPixels(asPal).get.px.toSeq ==
      MediaCodec.decodePngPixels(asGray).get.px.toSeq)
  }

  test("palette corruption quarantines: no PLTE, index overflow, ragged/late PLTE") {
    val pal4 = Array.tabulate(4)(i => Array(i * 60, i * 40, i * 20))
    val good = MediaCodec.pngPalette(6, 4, pal4, (x, y) => (x + y) % 4)
    assert(MediaCodec.decodePngPixels(good).isDefined)
    def chunkAt(b: Array[Byte], t: String): Int = {
      var pos = 8
      while (pos + 12 <= b.length) {
        def be32(i: Int): Int = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
          ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (new String(b.slice(pos + 4, pos + 8), "US-ASCII") == t) return pos
        pos += 12 + be32(pos)
      }
      -1
    }
    // strip the PLTE chunk entirely: indices with no table is corrupt
    val p = chunkAt(good, "PLTE")
    val plteLen = 12 + 12 // 4 triples + chunk overhead
    val noPlte = good.take(p) ++ good.drop(p + plteLen)
    assert(MediaCodec.decodePngPixels(noPlte).isEmpty)
    // an index past the palette is corruption, not a black pixel: encode
    // with a 251-entry table containing index 200, then splice in the
    // 4-entry PLTE (whole-chunk splice keeps every CRC valid)
    val overflow = MediaCodec.pngPalette(6, 4, Array.tabulate(251)(i =>
      Array(i, i, i)), (x, y) => if (x == 3 && y == 2) 200 else (x + y) % 4)
    val op = chunkAt(overflow, "PLTE")
    val opLen = 12 + 753
    val gp = chunkAt(good, "PLTE")
    val spliced = overflow.take(op) ++ good.slice(gp, gp + plteLen) ++
      overflow.drop(op + opLen)
    assert(MediaCodec.decodePngPixels(spliced).isEmpty)
    // ragged PLTE (not a whole number of triples): an 11-byte payload
    // with a VALID chunk CRC must still quarantine on the %3 contract
    val raggedPayload = good.slice(p + 8, p + 8 + 11)
    val crc = new java.util.zip.CRC32()
    crc.update("PLTE".getBytes("US-ASCII")); crc.update(raggedPayload)
    val v = crc.getValue.toInt
    val raggedChunk = Array[Byte](0, 0, 0, 11) ++
      "PLTE".getBytes("US-ASCII") ++ raggedPayload ++
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val raggedPng = good.take(p) ++ raggedChunk ++ good.drop(p + plteLen)
    assert(MediaCodec.decodePngPixels(raggedPng).isEmpty)
  }

  // ------------------------------------------------------------- MP4

  // a hand-laid-out (not synthesized) minimal MP4: ftyp(16) +
  // moov(8 + mvhd(108) + trak(100)) + mdat(8) — v0 boxes, timescale
  // 1000, duration 2500 (=> 2500 ms), one 320x240 track. Pinned so the
  // parser is tested against the SPEC layout, not the synthesizer's.
  private val realMp4: Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { o.write(v >>> 24); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff) }
    def tag(s: String): Unit = s.foreach(c => o.write(c.toInt))
    be32(16); tag("ftyp"); tag("isom"); be32(0)
    be32(8 + 108 + 100); tag("moov")
    be32(108); tag("mvhd"); be32(0) // version 0 + flags
    be32(0); be32(0) // ctime mtime
    be32(1000); be32(2500) // timescale, duration
    be32(0x00010000); o.write(1); o.write(0) // rate, volume
    (1 to 10).foreach(_ => o.write(0))
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(be32)
    (1 to 24).foreach(_ => o.write(0))
    be32(2) // next track id
    be32(100); tag("trak")
    be32(92); tag("tkhd"); be32(3) // version 0 + enabled flags
    be32(0); be32(0); be32(1); be32(0); be32(2500) // times, id, res, dur
    (1 to 16).foreach(_ => o.write(0)) // reserved + layer/alt/vol/res
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(be32)
    be32(320 << 16); be32(240 << 16)
    be32(8); tag("mdat")
    o.toByteArray
  }

  test("parses a hand-laid-out MP4 (pinned spec layout, not synthesized)") {
    assert(MediaCodec.parseMp4(realMp4) ==
      Some(MediaCodec.VideoHeader("mp4", 2500L, 320, 240, 1)))
  }

  test("mp4 synthesize -> parse round-trips both box versions") {
    for (v <- Seq(0, 1)) {
      val b = MediaCodec.mp4Header(timescale = 600, duration = 1800,
        tracks = Seq((640, 480)), version = v)
      assert(MediaCodec.parseMp4(b) ==
        Some(MediaCodec.VideoHeader("mp4", 3000L, 640, 480, 1)), s"v$v")
    }
    // u32 fields are UNSIGNED: a v0 duration past 2^31 (a ~6.6 h
    // recording at MPEG's 90 kHz timescale) must parse positive, not
    // sign-extend to a misquarantine
    val long0 = MediaCodec.mp4Header(90000, 0x80000000L, Seq((640, 480)))
    assert(MediaCodec.parseMp4(long0) ==
      Some(MediaCodec.VideoHeader("mp4", 0x80000000L * 1000L / 90000L,
        640, 480, 1)))
    // duration floors (integer ms): 100 units at timescale 600 -> 166 ms
    val f = MediaCodec.mp4Header(600, 100, Seq((8, 8)))
    assert(MediaCodec.parseMp4(f).get.durationMs == 166L)
  }

  test("mp4 zero-dim (audio) tracks are counted but never pick the dims") {
    val b = MediaCodec.mp4Header(600, 600, Seq((0, 0), (1920, 1080), (0, 0)))
    assert(MediaCodec.parseMp4(b) ==
      Some(MediaCodec.VideoHeader("mp4", 1000L, 1920, 1080, 3)))
  }

  test("mp4 corruption returns None, never throws") {
    assert(MediaCodec.parseMp4(Array.empty[Byte]).isEmpty)
    assert(MediaCodec.parseMp4(realMp4.take(20)).isEmpty) // truncated moov
    assert(MediaCodec.parseMp4("definitely not an mp4 container".getBytes).isEmpty)
    // box size smaller than its own header
    val badSize = realMp4.clone(); badSize(19) = 4 // moov size -> 4
    assert(MediaCodec.parseMp4(badSize).isEmpty)
    // box size past the end of the file
    val overrun = realMp4.clone(); overrun(16) = 0x7f.toByte
    assert(MediaCodec.parseMp4(overrun).isEmpty)
    // zero timescale
    val zeroTs = MediaCodec.mp4Header(0, 100, Seq((4, 4)))
    assert(MediaCodec.parseMp4(zeroTs).isEmpty)
    // no video track at all -> None (no dims to report)
    val audioOnly = MediaCodec.mp4Header(600, 600, Seq((0, 0)))
    assert(MediaCodec.parseMp4(audioOnly).isEmpty)
    // ftyp-only file: no moov
    assert(MediaCodec.parseMp4(realMp4.take(16)).isEmpty)
  }

  // ------------------------------------------------- MP4 raw-luma codec

  // a hand-laid-out (not synthesized) raw-luma MP4: same v0 box layout
  // as realMp4 but 2×2 track dims and an mdat holding 3 whole frames
  // (12 gray8 bytes, value 10·f + i). Pinned against the SPEC layout so
  // a symmetric encode/decode bug in the synthesizer cannot cancel out.
  private val realLumaMp4: Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { o.write(v >>> 24); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff) }
    def tag(s: String): Unit = s.foreach(c => o.write(c.toInt))
    be32(16); tag("ftyp"); tag("isom"); be32(0)
    be32(8 + 108 + 100); tag("moov")
    be32(108); tag("mvhd"); be32(0)
    be32(0); be32(0)
    be32(600); be32(72) // timescale, duration (3 frames at 24 units)
    be32(0x00010000); o.write(1); o.write(0)
    (1 to 10).foreach(_ => o.write(0))
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(be32)
    (1 to 24).foreach(_ => o.write(0))
    be32(2)
    be32(100); tag("trak")
    be32(92); tag("tkhd"); be32(3)
    be32(0); be32(0); be32(1); be32(0); be32(72)
    (1 to 16).foreach(_ => o.write(0))
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(be32)
    be32(2 << 16); be32(2 << 16)
    be32(8 + 12); tag("mdat")
    for (f <- 0 until 3; i <- 0 until 4) o.write(10 * f + i)
    o.toByteArray
  }

  test("decodes a hand-laid-out raw-luma MP4 (pinned spec layout)") {
    val v = MediaCodec.decodeMp4Luma(realLumaMp4).get
    assert(v.width == 2 && v.height == 2 && v.nFrames == 3)
    assert(v.px.map(_ & 0xff).toSeq ==
      (for (f <- 0 until 3; i <- 0 until 4) yield 10 * f + i))
  }

  test("mp4LumaVideo encode -> decode round-trips exact frames") {
    def pix(f: Int, i: Int): Int = (f * 37 + i * 13 + 5) % 256
    val b = MediaCodec.mp4LumaVideo(6, 4, 10, pix)
    val v = MediaCodec.decodeMp4Luma(b).get
    assert(v.width == 6 && v.height == 4 && v.nFrames == 10)
    for (f <- 0 until 10; i <- 0 until 24)
      assert((v.px(f * 24 + i) & 0xff) == pix(f, i), s"($f,$i)")
    // frame count comes from the mdat payload, not trusted metadata
    assert(MediaCodec.parseMp4(b).get.durationMs == 10 * 24 * 1000L / 600)
  }

  test("luma mp4 corruption quarantines: truncation, dup mdat, ragged/empty payload") {
    val good = MediaCodec.mp4LumaVideo(2, 2, 3, (f, i) => 10 * f + i)
    assert(MediaCodec.decodeMp4Luma(good).isDefined)
    // truncated mid-header
    assert(MediaCodec.decodeMp4Luma(good.take(25)).isEmpty)
    // a SECOND mdat is an ambiguous container: which payload is real?
    val dup = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(good, 0, good.length)
      Seq(0, 0, 0, 12).foreach(o.write)
      "mdat".foreach(c => o.write(c.toInt))
      (1 to 4).foreach(o.write)
      o.toByteArray
    }
    assert(MediaCodec.decodeMp4Luma(dup).isEmpty)
    // payload not a whole number of 2×2 frames
    val ragged = MediaCodec.mp4Header(600, 72, Seq((2, 2)),
      payload = Array.tabulate[Byte](13)(_.toByte))
    assert(MediaCodec.decodeMp4Luma(ragged).isEmpty)
    // empty mdat: zero frames is not a video
    val empty = MediaCodec.mp4Header(600, 72, Seq((2, 2)))
    assert(MediaCodec.decodeMp4Luma(empty).isEmpty)
    // no video track at all (metadata walk already rejects)
    val audioOnly = MediaCodec.mp4Header(600, 72, Seq((0, 0)),
      payload = Array.tabulate[Byte](4)(_.toByte))
    assert(MediaCodec.decodeMp4Luma(audioOnly).isEmpty)
    // never throws on garbage
    assert(MediaCodec.decodeMp4Luma("garbage".getBytes).isEmpty)
    assert(MediaCodec.decodeMp4Luma(Array.empty[Byte]).isEmpty)
  }

  // ------------------------------------------------------------- WAV

  // a hand-laid-out (not synthesized) minimal PCM WAV: RIFF/WAVE +
  // fmt (16: PCM, 2ch, 8000 Hz, 16-bit) + data(8 = 2 frames). Pinned
  // so the parser is tested against the SPEC layout (little-endian!),
  // not the synthesizer's.
  private val realWav: Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write(v >>> 24) }
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff) }
    def tag(s: String): Unit = s.foreach(c => o.write(c.toInt))
    tag("RIFF"); le32(4 + 24 + 16); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(2) // PCM, 2 channels
    le32(8000); le32(8000 * 4) // sample rate, byte rate
    le16(4); le16(16) // block align, bits
    tag("data"); le32(8)
    (1 to 8).foreach(o.write)
    o.toByteArray
  }

  test("parses a hand-laid-out WAV (pinned spec layout, little-endian)") {
    assert(MediaCodec.parseWav(realWav) ==
      Some(MediaCodec.AudioHeader("wav", 0L, 8000, 2, 16, 2L)))
  }

  test("wav synthesize -> parse round-trips, with and without junk chunk") {
    for (junk <- Seq(false, true)) {
      val b = MediaCodec.wavHeader(sampleRate = 8000, channels = 1,
        bitsPerSample = 16, nSamples = 4000, junkChunk = junk)
      assert(MediaCodec.parseWav(b) ==
        Some(MediaCodec.AudioHeader("wav", 500L, 8000, 1, 16, 4000L)),
        s"junk=$junk")
    }
    // duration floors: 999 samples at 8 kHz -> 124 ms, not 125
    val f = MediaCodec.wavHeader(8000, 1, 8, 999)
    assert(MediaCodec.parseWav(f).get.durationMs == 124L)
  }

  // A complete 16-bit mono PCM WAV produced by an INDEPENDENT encoder
  // (Python struct; odd-sized LIST chunk before fmt exercises the
  // pad-byte rule), pinned byte-for-byte. sample(s) = s*37 - 80.
  private val realWav6: Array[Byte] = Array(
    0x52, 0x49, 0x46, 0x46, 0x30, 0x00, 0x00, 0x00, 0x57, 0x41, 0x56, 0x45,
    0x4c, 0x49, 0x53, 0x54, 0x05, 0x00, 0x00, 0x00, 0x49, 0x4e, 0x46, 0x4f,
    0x78, 0x00, 0x66, 0x6d, 0x74, 0x20, 0x10, 0x00, 0x00, 0x00, 0x01, 0x00,
    0x01, 0x00, 0x40, 0x1f, 0x00, 0x00, 0x80, 0x3e, 0x00, 0x00, 0x02, 0x00,
    0x10, 0x00, 0x64, 0x61, 0x74, 0x61, 0x0c, 0x00, 0x00, 0x00, 0xb0, 0xff,
    0xd5, 0xff, 0xfa, 0xff, 0x1f, 0x00, 0x44, 0x00, 0x69, 0x00)
    .map(_.toByte)

  test("decodes an independently-encoded PCM WAV (pinned bytes, negative samples)") {
    val s = MediaCodec.decodeWavPcm16Mono(realWav6).get
    assert(s.toSeq == (0 until 6).map(_ * 37 - 80))
  }

  test("wavPcm16Mono encode -> decode round-trips exact samples") {
    def v(s: Int): Int = ((s * 131 + 7) % 2048) - 1024
    val b = MediaCodec.wavPcm16Mono(8000, 300, v)
    val s = MediaCodec.decodeWavPcm16Mono(b).get
    assert(s.length == 300)
    assert(s.toSeq == (0 until 300).map(v))
    // quarantine: truncation, stereo/8-bit formats, size lies
    assert(MediaCodec.decodeWavPcm16Mono(b.take(30)).isEmpty)
    assert(MediaCodec.decodeWavPcm16Mono(
      MediaCodec.wavHeader(8000, channels = 2, bitsPerSample = 16,
        nSamples = 4)).isEmpty)
    assert(MediaCodec.decodeWavPcm16Mono(
      MediaCodec.wavHeader(8000, channels = 1, bitsPerSample = 8,
        nSamples = 4)).isEmpty)
    // data-chunk size field (offset 40-43: RIFF hdr 12 + fmt 24 + id 4)
    // claims ~2GB with 600 bytes left — the bound check must catch it
    val lie = b.clone()
    lie(40) = -1; lie(41) = -1; lie(42) = -1; lie(43) = 0x7f
    assert(MediaCodec.decodeWavPcm16Mono(lie).isEmpty)
    // a SECOND data chunk is an ambiguous container — quarantine, never
    // let the later chunk silently win
    val dup = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(b, 0, b.length)
      "data".foreach(c => o.write(c.toInt))
      Seq(2, 0, 0, 0).foreach(o.write)
      o.write(1); o.write(2)
      o.toByteArray
    }
    assert(MediaCodec.decodeWavPcm16Mono(dup).isEmpty)
  }

  test("wav corruption returns None, never throws") {
    assert(MediaCodec.parseWav(Array.empty[Byte]).isEmpty)
    assert(MediaCodec.parseWav(realWav.take(20)).isEmpty) // truncated fmt
    assert(MediaCodec.parseWav("RIFFxxxxNOPE".getBytes).isEmpty)
    // RIFF size pointing past the buffer = truncated file
    val shortBuf = realWav.clone(); shortBuf(4) = 0x7f.toByte
    assert(MediaCodec.parseWav(shortBuf).isEmpty)
    // non-PCM format tag
    val float = realWav.clone(); float(20) = 3 // IEEE float tag
    assert(MediaCodec.parseWav(float).isEmpty)
    // inconsistent blockAlign (2ch 16-bit must be 4)
    val badAlign = realWav.clone(); badAlign(32) = 2
    assert(MediaCodec.parseWav(badAlign).isEmpty)
    // inconsistent byteRate
    val badRate = realWav.clone(); badRate(28) = 1
    assert(MediaCodec.parseWav(badRate).isEmpty)
    // data size not a whole number of frames (8 -> 7)
    val ragged = realWav.clone()
    ragged(40) = 7; ragged(4) = (realWav(4) - 1).toByte
    assert(MediaCodec.parseWav(ragged).isEmpty)
    // zero sample rate
    val zeroSr = realWav.clone()
    zeroSr(24) = 0; zeroSr(25) = 0; zeroSr(28) = 0; zeroSr(29) = 0
    assert(MediaCodec.parseWav(zeroSr).isEmpty)
    // fmt-only file (RIFF size patched to match): no data chunk
    val fmtOnly = realWav.take(36); fmtOnly(4) = 28
    assert(MediaCodec.parseWav(fmtOnly).isEmpty)
    // 32-bit overflow bait: rate=2^30 (positive), blockAlign=4 makes
    // rate*align wrap to 0 in Int arithmetic, "matching" byteRate=0 —
    // the consistency check must compute in Long and quarantine
    val ovfl = realWav.clone()
    ovfl(24) = 0; ovfl(25) = 0; ovfl(26) = 0; ovfl(27) = 0x40.toByte
    ovfl(28) = 0; ovfl(29) = 0; ovfl(30) = 0; ovfl(31) = 0
    assert(MediaCodec.parseWav(ovfl).isEmpty)
  }

  // ===== baseline JPEG (grayscale) =====================================

  test("jpegGray: 8x8-constant mosaics round-trip EXACT pixels " +
      "(all-ones quant, DC-only blocks)") {
    for (seed <- Seq(0L, 7L, 123L)) {
      def p(x: Int, y: Int): Int =
        ((seed * 37 + (x / 8) * 11 + (y / 8) * 29) % 256).toInt
      val bytes = MediaCodec.jpegGray(72, 64, p)
      // the container parses as a JPEG with the right dims
      val hdr = MediaCodec.parseJpeg(bytes)
      assert(hdr.exists(h => h.width == 72 && h.height == 64 &&
        h.channels == 1))
      val img = MediaCodec.decodeJpegGray(bytes).get
      assert(img.width == 72 && img.height == 64)
      for (y <- 0 until 64; x <- 0 until 72)
        assert((img.px(y * 72 + x) & 0xff) == p(x, y), s"($x, $y) seed=$seed")
    }
  }

  test("jpegGray: a NON-constant image (real AC coefficients) decodes " +
      "within the quant=1 rounding budget, never exactly garbage") {
    def p(x: Int, y: Int): Int = (x * 3 + y * 5 + (x * y) % 13) % 256
    val bytes = MediaCodec.jpegGray(32, 24, p)
    val img = MediaCodec.decodeJpegGray(bytes).get
    var maxErr = 0
    for (y <- 0 until 24; x <- 0 until 32) {
      val err = math.abs((img.px(y * 32 + x) & 0xff) - p(x, y))
      maxErr = math.max(maxErr, err)
    }
    // all-ones quantization: the only loss is coefficient rounding,
    // |err| stays within a couple of levels — a codec bug (wrong
    // zigzag, bad EXTEND, broken Huffman) blows this up immediately
    assert(maxErr <= 2, s"max pixel error $maxErr")
  }

  test("jpeg pixel decode quarantines: truncation, mid-scan marker, " +
      "progressive, color, restart intervals") {
    def p(x: Int, y: Int): Int = ((x / 8) * 19 + (y / 8) * 7) % 256
    val good = MediaCodec.jpegGray(16, 16, p)
    assert(MediaCodec.decodeJpegGray(good).isDefined)
    // truncated anywhere: quarantine, never throw
    for (cut <- Seq(1, 4, 20, good.length / 2, good.length - 1))
      assert(MediaCodec.decodeJpegGray(good.take(cut)).isEmpty, s"cut=$cut")
    // the header-only synthesis (payload, no scan tables) quarantines
    val hdrOnly = MediaCodec.jpegHeader(16, 16, 1, Array[Byte](1, 2, 3))
    assert(MediaCodec.decodeJpegGray(hdrOnly).isEmpty)
    // SOF0 -> SOF2 (progressive): reject
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(MediaCodec.decodeJpegGray(prog).isEmpty)
    // 3-component SOF (color): reject — needs len patch too, so build
    // via the header synthesizer (valid 3-comp SOF0, no scan)
    assert(MediaCodec.decodeJpegGray(
      MediaCodec.jpegHeader(16, 16, 3, Array.emptyByteArray)).isEmpty)
    // not a JPEG at all
    assert(MediaCodec.decodeJpegGray(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(MediaCodec.decodeJpegGray(Array.emptyByteArray).isEmpty)
    // short-segment bait at the EXACT end of the buffer: an SOF0/SOS
    // whose declared length fits the buffer but not the fields the
    // decoder must read — quarantine, never an out-of-bounds throw
    def seg(m: Int, payload: Int*): Array[Byte] =
      (Seq(0xff, m, (payload.size + 2) >> 8, (payload.size + 2) & 0xff) ++
        payload).map(_.toByte).toArray
    val shortSof = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      seg(0xc0, 8, 0, 16, 0, 16, 1) // len 8 < 11: truncated component spec
    assert(MediaCodec.decodeJpegGray(shortSof).isEmpty)
    val shortSos = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      seg(0xc0, 8, 0, 16, 0, 16, 1, 0x11, 0) ++
      seg(0xda, 1) // len 3 < 8: fields past the buffer end
    assert(MediaCodec.decodeJpegGray(shortSos).isEmpty)
  }

  test("decode-gate rate on a mixed JPEG corpus: baseline decodes, " +
      "progressive/DRI quarantine — the measured scope-decision split") {
    // the r15 scope decision (SURVEY §9 / BENCH_NOTES): progressive
    // (SOF2) and restart-interval (DRI) streams are quarantined BY
    // CONTRACT, not silently misdecoded. This pins the gate's measured
    // split on a 40-stream mix: every baseline stream (gray, 4:2:0,
    // 4:4:4) decodes; every SOF2/DRI stream gates; rate = exactly the
    // non-baseline fraction (25% here), never a baseline casualty.
    def pix(s: Int)(x: Int, y: Int): Int = ((x / 8) * (19 + s) + (y / 8) * 7) % 256
    def color(s: Int, subsample: Boolean): Array[Byte] =
      MediaCodec.jpegColor(16, 16, pix(s),
        (x, y) => (pix(s)(x, y) + 31) % 256,
        (x, y) => (pix(s)(x, y) + 97) % 256, subsample)
    def toProgressive(b: Array[Byte]): Array[Byte] = {
      val out = b.clone()
      val sof = out.indices.find(i => (out(i) & 0xff) == 0xff &&
        (out(i + 1) & 0xff) == 0xc0).get
      out(sof + 1) = 0xc2.toByte
      out
    }
    def withDri(b: Array[Byte]): Array[Byte] = {
      val sos = b.indices.find(i => (b(i) & 0xff) == 0xff &&
        (b(i + 1) & 0xff) == 0xda).get
      val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x08).map(_.toByte)
      b.take(sos) ++ dri ++ b.drop(sos)
    }
    val baseline =
      (0 until 10).map(s => MediaCodec.jpegGray(16, 16, pix(s))) ++
      (0 until 10).map(s => color(s, subsample = true)) ++
      (0 until 10).map(s => color(s, subsample = false))
    val gated =
      (0 until 3).map(s => toProgressive(MediaCodec.jpegGray(16, 16, pix(s)))) ++
      (0 until 3).map(s => toProgressive(color(s, subsample = true))) ++
      (0 until 2).map(s => withDri(MediaCodec.jpegGray(16, 16, pix(s)))) ++
      (0 until 2).map(s => withDri(color(s, subsample = false)))
    val mix = baseline ++ gated
    assert(mix.size == 40)
    val decoded = mix.map(MediaCodec.decodeJpeg(_).isDefined)
    assert(decoded.take(baseline.size).forall(identity),
      "a baseline stream was misquarantined")
    assert(!decoded.drop(baseline.size).exists(identity),
      "a progressive/DRI stream was misdecoded")
    val gateRate = decoded.count(!_).toDouble / mix.size
    assert(gateRate == 0.25) // exactly the non-baseline fraction
  }

  // ===== baseline JPEG (color: 4:2:0 / 4:4:4) ==========================

  /** The decoder's integer YCbCr→luma fold, restated independently with
    * math.floorDiv (the decoder shifts) — a sign-handling bug in either
    * formulation breaks the comparison.
    */
  private def lumaRef(y: Int, cb: Int, cr: Int): Int = {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val r = clamp(y + math.floorDiv(91881 * (cr - 128), 65536))
    val g = clamp(y - math.floorDiv(22554 * (cb - 128) + 46802 * (cr - 128), 65536))
    val b = clamp(y + math.floorDiv(116130 * (cb - 128), 65536))
    (77 * r + 150 * g + 29 * b) >> 8
  }

  test("jpegColor 4:2:0: block-constant planes round-trip EXACT luma " +
      "(partial 72-wide MCUs, per-component quant + Huffman routing)") {
    for (seed <- Seq(0L, 5L, 99L)) {
      def yF(x: Int, y: Int): Int =
        ((seed * 37 + (x / 8) * 11 + (y / 8) * 29) % 256).toInt
      // chroma declared at 36×32, constant per chroma 8×8 block
      def cbF(cx: Int, cy: Int): Int =
        ((seed * 13 + (cx / 8) * 50 + (cy / 8) * 30 + 60) % 256).toInt
      def crF(cx: Int, cy: Int): Int =
        ((seed * 19 + (cx / 8) * 40 + (cy / 8) * 20 + 90) % 256).toInt
      val bytes = MediaCodec.jpegColor(72, 64, yF, cbF, crF, subsample = true)
      val hdr = MediaCodec.parseJpeg(bytes)
      assert(hdr.exists(h => h.width == 72 && h.height == 64 &&
        h.channels == 3))
      val img = MediaCodec.decodeJpeg(bytes).get
      assert(img.width == 72 && img.height == 64)
      for (y <- 0 until 64; x <- 0 until 72) {
        val want = lumaRef(yF(x, y), cbF(x / 2, y / 2), crF(x / 2, y / 2))
        assert((img.px(y * 72 + x) & 0xff) == want, s"($x, $y) seed=$seed")
      }
    }
  }

  test("jpegColor 4:4:4: full-res chroma round-trips EXACT luma") {
    def yF(x: Int, y: Int): Int = ((x / 8) * 23 + (y / 8) * 17 + 5) % 256
    def cbF(x: Int, y: Int): Int = ((x / 8) * 31 + (y / 8) * 3 + 80) % 256
    def crF(x: Int, y: Int): Int = ((x / 8) * 7 + (y / 8) * 41 + 150) % 256
    val bytes = MediaCodec.jpegColor(32, 24, yF, cbF, crF, subsample = false)
    val img = MediaCodec.decodeJpeg(bytes).get
    assert(img.width == 32 && img.height == 24)
    for (y <- 0 until 24; x <- 0 until 32) {
      val want = lumaRef(yF(x, y), cbF(x, y), crF(x, y))
      assert((img.px(y * 32 + x) & 0xff) == want, s"($x, $y)")
    }
  }

  test("jpegColor: decodeJpegGray still QUARANTINES color; decodeJpeg " +
      "accepts it — and the gray paths agree on gray streams") {
    val color = MediaCodec.jpegColor(16, 16,
      (x, y) => (x / 8 * 30 + y / 8 * 50) % 256,
      (_, _) => 100, (_, _) => 140, subsample = false)
    assert(MediaCodec.decodeJpegGray(color).isEmpty,
      "grayscale-only contract must survive the color decoder")
    assert(MediaCodec.decodeJpeg(color).isDefined)
    val gray = MediaCodec.jpegGray(16, 16, (x, y) => (x * 5 + y * 11) % 256)
    val a = MediaCodec.decodeJpegGray(gray).get
    val b = MediaCodec.decodeJpeg(gray).get
    assert(a.px.sameElements(b.px) && a.width == b.width)
  }

  test("jpegColor: the id-1 chroma DHTs carry DISTINCT content, and " +
      "misrouting chroma to the luma tables cannot decode the scan") {
    val bytes = MediaCodec.jpegColor(32, 32,
      (x, y) => (x / 8 * 13 + y / 8 * 7 + 30) % 256,
      (x, y) => (x / 16 * 60 + 70) % 256,
      (x, y) => (y / 16 * 80 + 50) % 256, subsample = true)
    // collect the four DHT payloads (class<<4|id byte + BITS + HUFFVAL)
    def u8(i: Int) = bytes(i) & 0xff
    var i = 2
    var dhts = Map.empty[Int, Seq[Byte]]
    while (i + 4 <= bytes.length && u8(i) == 0xff && u8(i + 1) != 0xda) {
      val m = u8(i + 1); val len = (u8(i + 2) << 8) | u8(i + 3)
      if (m == 0xc4) {
        val body = bytes.slice(i + 4, i + 2 + len)
        dhts += (body(0) & 0xff) -> body.drop(1).toSeq
      }
      i += 2 + len
    }
    assert(dhts.keySet == Set(0x00, 0x10, 0x01, 0x11))
    assert(dhts(0x00) != dhts(0x01), "DC chroma content must differ")
    assert(dhts(0x10) != dhts(0x11), "AC chroma content must differ")
    // point the SOS chroma selectors at the LUMA tables: with distinct
    // content the entropy stream desyncs and the decode must quarantine
    // (never return the right pixels by accident)
    val sos = (2 until bytes.length - 1).find(j =>
      u8(j) == 0xff && u8(j + 1) == 0xda).get
    val patched = bytes.clone()
    patched(sos + 8) = 0x00 // Cb Td/Ta
    patched(sos + 10) = 0x00 // Cr Td/Ta
    val mis = MediaCodec.decodeJpeg(patched)
    val good = MediaCodec.decodeJpeg(bytes).get
    assert(mis.forall(m => !m.px.sameElements(good.px)),
      "misrouted tables must not reproduce the correct pixels")
  }

  test("jpegColor quarantines: truncation anywhere, 4:2:2 sampling " +
      "out of contract") {
    val bytes = MediaCodec.jpegColor(16, 16,
      (x, y) => (x + y) % 256, (_, _) => 90, (_, _) => 160,
      subsample = true)
    assert(MediaCodec.decodeJpeg(bytes).isDefined)
    for (cut <- Seq(1, 4, 30, 150, bytes.length / 2, bytes.length - 1))
      assert(MediaCodec.decodeJpeg(bytes.take(cut)).isEmpty, s"cut=$cut")
    // patch Y sampling 2x2 -> 2x1 (4:2:2): outside the decode contract
    def u8(i: Int) = bytes(i) & 0xff
    val sof = (2 until bytes.length - 1).find(j =>
      u8(j) == 0xff && u8(j + 1) == 0xc0).get
    val p422 = bytes.clone()
    p422(sof + 11) = 0x21
    assert(MediaCodec.decodeJpeg(p422).isEmpty)
  }

  test("jpegColor vs javax.imageio (third-party decoder oracle): " +
      "lumas agree within fixed-point rounding") {
    // 4:2:0 uses WHOLE-IMAGE-constant chroma so ImageIO's upsampling
    // filter choice (libjpeg 'fancy' triangular vs replication) cannot
    // matter; 4:4:4 varies chroma per 8x8 block (no upsampling there).
    val cases = Seq(
      ("420", MediaCodec.jpegColor(72, 64,
        (x, y) => ((x / 8) * 11 + (y / 8) * 29 + 40) % 256,
        (_, _) => 96, (_, _) => 170, subsample = true),
        (x: Int, y: Int) => lumaRef(
          ((x / 8) * 11 + (y / 8) * 29 + 40) % 256, 96, 170)),
      ("444", MediaCodec.jpegColor(32, 24,
        (x, y) => ((x / 8) * 23 + (y / 8) * 17 + 5) % 256,
        (x, y) => ((x / 8) * 31 + 80) % 256,
        (x, y) => ((y / 8) * 41 + 150) % 256, subsample = false),
        (x: Int, y: Int) => lumaRef(
          ((x / 8) * 23 + (y / 8) * 17 + 5) % 256,
          ((x / 8) * 31 + 80) % 256, ((y / 8) * 41 + 150) % 256)))
    for ((tag, bytes, want) <- cases) {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, s"ImageIO could not decode the $tag stream")
      val ours = MediaCodec.decodeJpeg(bytes).get
      assert(bi.getWidth == ours.width && bi.getHeight == ours.height)
      var maxImgIo = 0; var maxOurs = 0
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        val rgb = bi.getRGB(x, y)
        val lum3p = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff)
          + 29 * (rgb & 0xff)) >> 8
        maxImgIo = math.max(maxImgIo, math.abs(lum3p - want(x, y)))
        maxOurs = math.max(maxOurs,
          math.abs((ours.px(y * ours.width + x) & 0xff) - want(x, y)))
      }
      // our decode is exact by construction; ImageIO's YCbCr->RGB
      // rounds where we floor, so allow ±3 luma there
      assert(maxOurs == 0, s"$tag: our decode drifted ($maxOurs)")
      assert(maxImgIo <= 3, s"$tag: ImageIO disagrees by $maxImgIo")
    }
  }
}
