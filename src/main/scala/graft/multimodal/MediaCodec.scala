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

  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeBe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
}
