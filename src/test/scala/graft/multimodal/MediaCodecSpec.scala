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
}
