package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assets() =
    Multimodal.assetsFromDocuments(spark, Tables(spark, dir, "documents"))

  test("assets carry binary media + typed metadata; modality cycles by id") {
    val a = assets().collect()
    assert(a.length == 500)
    assert(a.forall(x => x.media.nonEmpty))
    assert(a.filter(_.asset_id % 3 == 0).forall(_.modality == "image"))
    assert(a.filter(_.asset_id % 3 == 1).forall(_.modality == "video"))
    assert(a.filter(_.asset_id % 3 == 2).forall(_.modality == "audio"))
  }

  test("decode stub features match a driver-side recomputation") {
    val feats = Multimodal.extractFeatures(assets()).collect()
      .map(f => f.asset_id -> f).toMap
    val raw = assets().collect()
    raw.take(20).foreach { a =>
      val sum = a.media.map(_ & 0xff).map(_.toLong).sum
      val f = feats(a.asset_id)
      assert(f.byte_len == a.media.length.toLong)
      assert(f.byte_sum == sum)
      assert(f.mean_byte_x100 == sum * 100 / a.media.length)
    }
  }

  test("audio decode recovers id-derived params; truncated assets quarantined") {
    val docs = Tables(spark, dir, "documents")
    val metas = Multimodal.decodeAudioMeta(
      Multimodal.audioAssets(spark, docs)).collect().map(m => m.asset_id -> m).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 91 == 0) assert(!metas.contains(id), s"id=$id not quarantined")
      else {
        val m = metas(id)
        assert(m.sample_rate == 8000L)
        assert(m.channels == 1 + id % 2)
        assert(m.bits_per_sample == (if (id % 3 == 0) 8L else 16L))
        assert(m.n_samples == 8L * (1 + id % 125))
        assert(m.duration_ms == 1 + id % 125) // 8 kHz: 8 samples per ms
      }
    }
  }

  test("phash pipeline: codec round-trip == direct formula; corruption quarantined") {
    val docs = Tables(spark, dir, "documents")
    val hashes = Multimodal.decodePhash(
      Multimodal.phashImageAssets(spark, docs)).collect()
      .map(h => h.asset_id -> h).toMap
    // differential: the full encode -> CRC verify -> inflate -> unfilter
    // -> block-mean path must equal the dHash computed STRAIGHT from the
    // pixel formula (no codec involved)
    def directHash(d: Long): (Long, Long) = {
      // mirror the color-group luma transform (alpha never participates)
      def lumaOf(v: Int): Long =
        if (Multimodal.pngColorType(d) == 0) v.toLong
        else (77 * Multimodal.channelValue(d, v, 0) +
          150 * Multimodal.channelValue(d, v, 1) +
          29 * Multimodal.channelValue(d, v, 2)).toLong >> 8
      val grid = Array.tabulate(9, 8)((bx, by) =>
        lumaOf(Multimodal.blockValue(d, bx, by)))
      var hi = 0L; var lo = 0L
      for (by <- 0 until 8; bx <- 0 until 8)
        if (grid(bx + 1)(by) > grid(bx)(by)) {
          val pos = by * 8 + bx
          if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
        }
      (hi, lo)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 91 == 0 || id % 97 == 0)
        assert(!hashes.contains(id), s"id=$id not quarantined")
      else {
        val h = hashes(id)
        assert((h.phash_hi, h.phash_lo) == directHash(id), s"id=$id")
        assert(h.phash_hi >= 0 && h.phash_hi < (1L << 32))
        assert(h.phash_lo >= 0 && h.phash_lo < (1L << 32))
      }
    }
  }

  test("jpeg phash pipeline: full baseline JPEG round-trip == direct " +
      "formula; truncation quarantined") {
    val docs = Tables(spark, dir, "documents")
    val hashes = Multimodal.decodeJpegPhash(
      Multimodal.jpegImageAssets(spark, docs)).collect()
      .map(h => h.asset_id -> h).toMap
    // differential: encode (DCT + Huffman) -> decode (Huffman + IDCT
    // + YCbCr fold for the color modes) -> dHash must equal the hash
    // computed straight from the mosaic formula — only possible because
    // all-ones/all-twos quantization makes block-constant planes
    // round-trip exactly
    def cellLuma(d: Long, bx: Int, by: Int): Long = {
      val p = Multimodal.blockValue(d, bx, by)
      if ((d / 4) % 3 == 0) p.toLong
      else {
        // the decoder's integer YCbCr fold, restated with floorDiv
        val cbd = Multimodal.chromaCb(d, bx / 2, by / 2) - 128
        val crd = Multimodal.chromaCr(d, bx / 2, by / 2) - 128
        def clamp(v: Int) = math.max(0, math.min(255, v))
        val r = clamp(p + math.floorDiv(91881 * crd, 65536))
        val g = clamp(p - math.floorDiv(22554 * cbd + 46802 * crd, 65536))
        val b = clamp(p + math.floorDiv(116130 * cbd, 65536))
        ((77 * r + 150 * g + 29 * b) >> 8).toLong
      }
    }
    def directHash(d: Long): (Long, Long) = {
      val grid = Array.tabulate(9, 8)((bx, by) => cellLuma(d, bx, by))
      var hi = 0L; var lo = 0L
      for (by <- 0 until 8; bx <- 0 until 8)
        if (grid(bx + 1)(by) > grid(bx)(by)) {
          val pos = by * 8 + bx
          if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
        }
      (hi, lo)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(ids.exists(_ % 91 == 0), "quarantine plant present")
    // the mixed corpus is non-vacuous: all three modes (gray, 4:2:0,
    // 4:4:4) are present AND decodable
    for (mode <- 0 to 2)
      assert(ids.exists(id => (id / 4) % 3 == mode && id % 91 != 0),
        s"mode $mode missing from the corpus")
    ids.foreach { id =>
      if (id % 91 == 0) assert(!hashes.contains(id), s"id=$id not quarantined")
      else {
        val h = hashes(id)
        assert((h.phash_hi, h.phash_lo) == directHash(id), s"id=$id")
      }
    }
  }

  test("phash pairs recover the planted near-dup groups, verified by Hamming") {
    val docs = Tables(spark, dir, "documents")
    val pairs = Multimodal.phashPairs(
      Multimodal.decodePhash(
        Multimodal.phashImageAssets(spark, docs)).toDF(),
      maxHamming = 10).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming")))
    assert(pairs.nonEmpty)
    // every pair is ordered, within threshold, and from the same
    // doc_id/4 planted group (cross-group hashes differ by ~32 bits)
    pairs.foreach { case (a, b, ham) =>
      assert(a < b)
      assert(ham >= 0 && ham <= 10)
      assert(a / 4 == b / 4, s"cross-group pair ($a,$b) ham=$ham")
    }
    // the planted structure is actually recovered: most 4-doc groups
    // yield pairs (members differ only by the small perturbation)
    val groups = pairs.map(_._1 / 4).distinct.length
    assert(groups > 50, s"only $groups groups recovered")
  }

  test("phashClusterEdges: cluster labels identical to the full pair " +
      "relation, on real hashes and on a duplicate-heavy corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def labels(hashes: org.apache.spark.sql.DataFrame,
        edges: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      graft.dedup.Dedup.clusterLabels(
        hashes.select(col("asset_id")), "asset_id",
        edges.select(col("a_id"), col("b_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // real decoded hashes (sf0.001 PNG path)
    val real = Multimodal.decodePhash(Multimodal.phashImageAssets(
      spark, Tables(spark, dir, "documents"))).toDF().localCheckpoint()
    assert(labels(real, Multimodal.phashClusterEdges(real, 10)) ==
      labels(real, Multimodal.phashPairs(real, 10)))
    // duplicate-heavy synthetic corpus: 40 assets per distinct hash —
    // the shape that makes the full candidate relation quadratic (the
    // r16 sf10 OOM mechanism); plus near groups one bit-flip apart and
    // a far hash that must stay its own cluster
    val dup = (0L until 200L).map { i =>
      val g = i / 40 // 5 groups of 40 identical hashes
      val hi = g match {
        case 0 => 0x1111L
        case 1 => 0x1111L ^ 1L // Hamming 1 from group 0 -> same cluster
        case 2 => 0x0F0F0F0FL
        case 3 => 0x0F0F0F0FL ^ 0x30L // Hamming 2 from group 2
        case _ => 0x7FFFFFFF00000000L // far from everything
      }
      (i, hi, g * 1000L)
    }.toDF("asset_id", "phash_hi", "phash_lo")
    // lo differs per group => only exact-equal within groups; hi links
    // groups 0-1 and 2-3 ONLY if lo bands collide... use equal lo for
    // linked groups instead:
    val dup2 = (0L until 200L).map { i =>
      val g = i / 40
      val (hi, lo) = g match {
        case 0 => (0x1111L, 7L)
        case 1 => (0x1111L ^ 1L, 7L)
        case 2 => (0x0F0FL, 9L)
        case 3 => (0x0F0FL ^ 0x30L, 9L)
        case _ => (0x7FFFFFFF00000000L, 11L)
      }
      (i, hi, lo)
    }.toDF("asset_id", "phash_hi", "phash_lo")
    for (h <- Seq(dup, dup2)) {
      val viaEdges = labels(h, Multimodal.phashClusterEdges(h, 10))
      val viaPairs = labels(h, Multimodal.phashPairs(h, 10))
      assert(viaEdges == viaPairs)
    }
    // and the contraction actually contracts: edge count is linear in
    // group size (39 star edges per group + rep-level near edges),
    // where the full relation carries C(40,2)+ pairs per group
    val nEdges = Multimodal.phashClusterEdges(dup2, 10).count()
    val nPairs = Multimodal.phashPairs(dup2, 10).count()
    assert(nEdges < 220, s"edges should be ~linear, got $nEdges")
    assert(nPairs > 3000, s"full relation should be quadratic, got $nPairs")
    // r17 multiplicity gate: on ALL-UNIQUE fingerprints the contraction
    // is skipped (max group size 1) and the edge relation must equal
    // the plain banded pair relation on ids — zero insurance premium
    // for clean media corpora
    import spark.implicits._
    val uniq = (0L until 24L).map(i =>
      (i, (0x9E3779B97F4A7C15L * (i + 1)) ^ (i << 17), i * 131))
      .toDF("asset_id", "phash_hi", "phash_lo")
    val gotU = labels(uniq, Multimodal.phashClusterEdges(uniq, 10))
    val expU = labels(uniq, Multimodal.phashPairs(uniq, 10))
    assert(gotU == expU)
  }

  test("audio ahash: codec round-trip == direct formula; truncation quarantined") {
    val docs = Tables(spark, dir, "documents")
    val hashes = Multimodal.decodeAhash(
      Multimodal.ahashAudioAssets(spark, docs)).collect()
      .map(h => h.asset_id -> (h.ahash_hi, h.ahash_lo)).toMap
    // differential: WAV encode -> chunk-walk decode -> frame energies
    // must equal the hash computed STRAIGHT from the sample formula
    def directHash(d: Long): (Long, Long) = {
      val fl = Multimodal.AhashFrameLen
      val e = Array.tabulate(Multimodal.AhashFrames)(f =>
        (f * fl until (f + 1) * fl)
          .map(s => math.abs(Multimodal.sampleValue(d, s)).toLong).sum)
      var hi = 0L; var lo = 0L
      for (f <- 0 until 64 if e(f + 1) > e(f))
        if (f >= 32) hi |= 1L << (f - 32) else lo |= 1L << f
      (hi, lo)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 89 == 0) assert(!hashes.contains(id), s"id=$id not quarantined")
      else assert(hashes(id) == directHash(id), s"id=$id")
    }
    // pairing recovers planted groups through the shared band machinery
    val pairs = Multimodal.phashPairs(
      Multimodal.decodeAhash(Multimodal.ahashAudioAssets(spark, docs)).toDF()
        .select(org.apache.spark.sql.functions.col("asset_id"),
          org.apache.spark.sql.functions.col("ahash_hi").as("phash_hi"),
          org.apache.spark.sql.functions.col("ahash_lo").as("phash_lo")),
      maxHamming = 10).collect()
    assert(pairs.nonEmpty)
    val inGroup = pairs.count(r =>
      r.getAs[Long]("a_id") / 4 == r.getAs[Long]("b_id") / 4)
    assert(inGroup > 100, s"only $inGroup in-group audio pairs")
  }

  test("video vhash: codec round-trip == direct formula; truncation quarantined") {
    val docs = Tables(spark, dir, "documents")
    val hashes = Multimodal.decodeVhash(
      Multimodal.vhashVideoAssets(spark, docs)).collect()
      .map(h => h.asset_id -> (h.vhash_hi, h.vhash_lo)).toMap
    // differential: MP4 encode -> box-walk decode -> frame energies must
    // equal the hash computed STRAIGHT from the frame-pixel formula
    def directHash(d: Long): (Long, Long) = {
      val fl = Multimodal.VhashFrameW * Multimodal.VhashFrameH
      val e = Array.tabulate(Multimodal.VhashFrames)(f =>
        (0 until fl).map(i => Multimodal.framePixel(d, f, i).toLong).sum)
      var hi = 0L; var lo = 0L
      for (f <- 0 until 64 if e(f + 1) > e(f))
        if (f >= 32) hi |= 1L << (f - 32) else lo |= 1L << f
      (hi, lo)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 83 == 0) assert(!hashes.contains(id), s"id=$id not quarantined")
      else assert(hashes(id) == directHash(id), s"id=$id")
    }
    // pairing recovers planted groups through the shared band machinery
    val pairs = Multimodal.phashPairs(
      Multimodal.decodeVhash(Multimodal.vhashVideoAssets(spark, docs)).toDF()
        .select(org.apache.spark.sql.functions.col("asset_id"),
          org.apache.spark.sql.functions.col("vhash_hi").as("phash_hi"),
          org.apache.spark.sql.functions.col("vhash_lo").as("phash_lo")),
      maxHamming = 10).collect()
    assert(pairs.nonEmpty)
    val inGroup = pairs.count(r =>
      r.getAs[Long]("a_id") / 4 == r.getAs[Long]("b_id") / 4)
    assert(inGroup > 100, s"only $inGroup in-group video pairs")
  }

  test("frame sampling: only video, every 4th frame, correct offsets") {
    val frames = Multimodal.sampleFrames(assets(), step = 4).collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_.getAs[Long]("asset_id"))
    val meta = assets().collect().map(a => a.asset_id -> a).toMap
    byAsset.foreach { case (id, fs) =>
      val a = meta(id)
      assert(a.modality == "video")
      val idxs = fs.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      assert(idxs == (0L until a.n_frames by 4).toSeq)
      fs.foreach { f =>
        assert(f.getAs[Long]("byte_offset") ==
          f.getAs[Long]("frame_idx") * a.width * a.height * 3)
      }
    }
  }
}
