package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class PackingSpec extends AnyFunSuite with SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map(i =>
      (i, Seq.fill(1 + i % 7)(s"tok$i word${i % 5}").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("packSpans: spans tile every sequence exactly, boundaries clip correctly") {
    val df = corpus(60) // token counts 2..14 across a 16-token seqLen:
    val seqLen = 16L    // plenty of straddling docs
    val spans = Packing.packSpans(df, "doc_id", "text", seqLen)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = df.select(sum(size(TextOps.tokens(col("text")))).cast("long"))
      .head().getLong(0)
    val lastSeq = (total - 1) / seqLen
    // per sequence: sorted spans are contiguous, start at 0, and end at
    // seqLen (or the tape's end for the final sequence) — block-diagonal
    // masking needs exactly this tiling
    val bySeq = spans.groupBy(_._2)
    assert(bySeq.keySet === (0L to lastSeq).toSet)
    for ((seq, ss) <- bySeq) {
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"seq $seq starts at 0")
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        assert(a._4 === b._3, s"seq $seq gap/overlap at ${a._4}")
      val expectedEnd = if (seq == lastSeq) total - seq * seqLen else seqLen
      assert(sorted.last._4 === expectedEnd, s"seq $seq end")
    }
    // straddling docs appear in >1 sequence with complementary clips
    val multi = spans.groupBy(_._1).filter(_._2.length > 1)
    assert(multi.nonEmpty, "corpus must contain boundary-straddling docs")
    for ((_, segs) <- multi) {
      val span = segs.map(s => s._4 - s._3).sum
      val n = segs.length
      // interior segments are full sequences
      assert(segs.count(s => s._3 == 0L && s._4 == seqLen) >= n - 2)
      assert(span > seqLen * (n - 2), "clips must rebuild the doc length")
    }
    // and the spans agree with packSequences' offsets doc-for-doc
    val packed = Packing.packSequences(df, "doc_id", "text", seqLen)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(1))).toMap
    for ((doc, segs) <- spans.groupBy(_._1)) {
      val (off, n) = packed(doc)
      val first = segs.minBy(_._2)
      assert(first._2 === off / seqLen)
      assert(first._3 === off - first._2 * seqLen)
      assert(segs.map(s => s._4 - s._3).sum === n, s"doc $doc total")
    }
  }

  test("offsets are the exclusive prefix sum in (content-hash, id) order — any bucket count") {
    val df = corpus(40)
    // naive reference: collect, sort by (rollingHash, id), running sum
    val keyed = df.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n"),
      TextOps.rollingHash(TextOps.normalize(col("text"))).as("okey"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, okey) => (okey, id) }
    var acc = 0L
    val expected = keyed.map { case (id, n, _) =>
      val off = acc; acc += n; id -> ((n, off))
    }.toMap
    for (buckets <- Seq(1, 4, 64)) {
      val got = Packing.packSequences(df, "doc_id", "text",
        seqLen = 16L, buckets = buckets)
        .collect().map(r => r.getAs[Int]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_offset")))).toMap
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("sequence ids and in-sequence offsets follow the tape contract") {
    val got = Packing.packSequences(corpus(40), "doc_id", "text",
      seqLen = 16L, buckets = 8).collect()
    got.foreach { r =>
      val off = r.getAs[Long]("tok_offset")
      assert(r.getAs[Long]("seq_id") == off / 16)
      assert(r.getAs[Long]("offset_in_seq") == off % 16)
    }
    // tape is gapless: offsets sorted == cumulative token counts
    val sorted = got.sortBy(_.getAs[Long]("tok_offset"))
    var acc = 0L
    sorted.foreach { r =>
      assert(r.getAs[Long]("tok_offset") == acc)
      acc += r.getAs[Long]("n_tokens")
    }
  }

  private def packed(df: org.apache.spark.sql.DataFrame, capacity: Long,
      buckets: Int = 8) =
    Packing.packBinsNoSplit(df, "doc_id", "text", capacity, buckets)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Int]("bucket"), r.getAs[Long]("bin_in_bucket"),
        r.getAs[Long]("offset_in_bin"), r.getAs[Long]("bin_id")))

  test("no-split packing: every doc whole in one bin, fills respect capacity") {
    // corpus docs are 2..14 tokens; capacity 16 > max, so NO doc is
    // oversized and every bin's fill must respect the cap
    val rows = packed(corpus(60), capacity = 16)
    assert(rows.map(_._1).distinct.length == 60) // each doc exactly once
    // per bin: offsets are the gapless running sum of sizes in pack order
    rows.groupBy(_._6).foreach { case (bin, ds) =>
      val inOrder = ds.sortBy(_._5)
      var acc = 0L
      inOrder.foreach { d =>
        assert(d._5 == acc, s"gap in bin $bin")
        acc += d._2
      }
      assert(acc <= 16, s"bin $bin overfilled: $acc")
    }
  }

  test("no-split packing: an oversized doc occupies a bin alone") {
    import spark.implicits._
    val df = Seq(
      (1, "a b c"), // 3 tokens
      (2, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 > capacity 8
      (3, "d e f g"), (4, "h i"), (5, "j k l m n")).toDF("doc_id", "text")
    val rows = packed(df, capacity = 8)
    val oversized = rows.find(_._1 == 2L).get
    assert(oversized._5 == 0L) // starts its bin
    assert(rows.count(_._6 == oversized._6) == 1) // and shares it with no one
    rows.filterNot(_._1 == 2L).groupBy(_._6).foreach { case (bin, ds) =>
      assert(ds.map(_._2).sum <= 8, s"bin $bin overfilled")
    }
  }

  test("no-split packing is a pure function of content — partitioning-invariant") {
    val df = corpus(50)
    val a = packed(df, capacity = 10).toSet
    val b = packed(df.repartition(13).sortWithinPartitions(desc("text")),
      capacity = 10).toSet
    val c = packed(df.coalesce(1), capacity = 10).toSet
    assert(a == b && a == c)
    // and bucket-local waste is bounded: every NON-TRAILING bin of a
    // bucket would overflow if it took the next doc — i.e. next-fit ran,
    // not something sparser (one collected run reused throughout)
    val byBucketBin = a.toSeq.groupBy(t => (t._3, t._4))
    byBucketBin.foreach { case ((bucket, bin), ds) =>
      byBucketBin.get((bucket, bin + 1)).foreach { nextBinDocs =>
        // the first doc of the NEXT bin could not have fit here
        val fill = ds.map(_._2).sum
        assert(fill + nextBinDocs.minBy(_._5)._2 > 10,
          s"bin ($bucket,$bin) closed early")
      }
    }
  }
}
