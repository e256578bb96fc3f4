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
