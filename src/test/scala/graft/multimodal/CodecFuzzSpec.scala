package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Decoder robustness under ARBITRARY bytes — the quarantine contract
  * stated adversarially: every decoder must return None (or a valid
  * decode) on any input, and must never throw. Corrupt-asset planting
  * in the corpus exercises a few known shapes; this sweeps seeded
  * random garbage, random truncations of VALID assets, and random
  * single-bit flips of valid assets — the three corruption classes a
  * real media crawl actually delivers. Pure JVM, no Spark.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "parseMp4" -> (b => MediaCodec.parseMp4(b)),
    "parseWav" -> (b => MediaCodec.parseWav(b)),
    "decodePngPixels" -> (b => MediaCodec.decodePngPixels(b)),
    "decodeMp4Luma" -> (b => MediaCodec.decodeMp4Luma(b)),
    "decodeWavPcm16Mono" -> (b => MediaCodec.decodeWavPcm16Mono(b)),
    "decodeJpegGray" -> (b => MediaCodec.decodeJpegGray(b)),
    "decodeJpeg" -> (b => MediaCodec.decodeJpeg(b)))

  private def validAssets: Seq[(String, Array[Byte])] = Seq(
    "png_gray" -> MediaCodec.pngGray(12, 9, (x, y) => (x * 7 + y * 3) % 256),
    "png_rgb" -> MediaCodec.pngColor(8, 8, 2, (x, y, c) => (x + y + c) % 256),
    "wav_pcm" -> MediaCodec.wavPcm16Mono(8000, 256, s => (s * 37) % 1024 - 512),
    "mp4_luma" -> MediaCodec.mp4LumaVideo(6, 4, 5, (f, i) => (f * 31 + i) % 256),
    "jpeg_gray" -> MediaCodec.jpegGray(16, 16, (x, y) => (x * 5 + y * 11) % 256),
    "jpeg_420" -> MediaCodec.jpegColor(24, 16,
      (x, y) => (x * 5 + y * 11) % 256,
      (cx, cy) => (cx * 9 + cy * 3 + 80) % 256,
      (cx, cy) => (cx * 4 + cy * 13 + 140) % 256, subsample = true),
    "jpeg_444" -> MediaCodec.jpegColor(16, 16,
      (x, y) => (x * 3 + y * 7) % 256,
      (x, y) => (x * 2 + y + 100) % 256,
      (x, y) => (x + y * 2 + 60) % 256, subsample = false))

  test("random garbage: every decoder returns, never throws") {
    for (seed <- 1 to 60) {
      val r = rng(seed.toLong)
      val b = new Array[Byte](r.nextInt(4096))
      r.nextBytes(b)
      for ((name, dec) <- decoders)
        try dec(b)
        catch { case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on garbage seed $seed")
        }
    }
  }

  test("random truncations of valid assets: None or valid, never a throw") {
    for ((aname, bytes) <- validAssets; seed <- 1 to 40) {
      val r = rng(seed.toLong * 31 + aname.hashCode)
      val cut = r.nextInt(bytes.length)
      val b = bytes.take(cut)
      for ((name, dec) <- decoders)
        try dec(b)
        catch { case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on $aname[0,$cut)")
        }
    }
  }

  test("random bit flips of valid assets: None or valid, never a throw") {
    for ((aname, bytes) <- validAssets; seed <- 1 to 60) {
      val r = rng(seed.toLong * 17 + aname.hashCode)
      val b = bytes.clone()
      // 1-4 independent bit flips anywhere in the container
      for (_ <- 0 to r.nextInt(4)) {
        val i = r.nextInt(b.length)
        b(i) = (b(i) ^ (1 << r.nextInt(8))).toByte
      }
      for ((name, dec) <- decoders)
        try dec(b)
        catch { case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on flipped $aname seed $seed")
        }
    }
    // the fuzz is non-vacuous: a CRC-covered flip must actually
    // quarantine (decode None), not slip through. Byte 45 sits inside
    // the IDAT chunk (signature 8 + IHDR 25 + IDAT header 8 = 41), so
    // the chunk CRC must reject the mutation
    val png = validAssets.collectFirst { case ("png_gray", b) => b }.get
    assert(MediaCodec.decodePngPixels(png).isDefined, "baseline decodes")
    val flipped = png.clone()
    flipped(45) = (flipped(45) ^ 0x10).toByte
    assert(MediaCodec.decodePngPixels(flipped).isEmpty,
      "CRC-covered bit flip must quarantine")
  }
}
