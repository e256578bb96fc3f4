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
}
