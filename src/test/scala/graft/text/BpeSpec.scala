package graft.text

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** BPE contract: the distributed trainer reproduces a from-scratch
  * scalar BPE (same argmax rule) merge for merge; encoding round-trips
  * (concatenating a word's tokens, minus the end marker, restores the
  * word); greedy merge application is left-to-right non-overlapping.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Scalar reference trainer, argmax by (count desc, l asc, r asc). */
  private def scalarTrain(words: Map[String, Long],
      merges: Int): Seq[(String, String, Long)] = {
    var syms: Map[String, (Seq[String], Long)] = words.map { case (w, n) =>
      w -> (w.split("").toSeq :+ Bpe.Eow, n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to merges if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (ss, n)) <- syms; i <- 0 until ss.size - 1)
        counts((ss(i), ss(i + 1))) = counts.getOrElse((ss(i), ss(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((l, r, c))
        syms = syms.map { case (w, (ss, n)) =>
          val merged = ss.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          w -> (merged, n)
        }
      }
    }
    out.toSeq
  }

  private lazy val wordCounts: Map[String, Long] =
    Bpe.wordCounts(graft.Tables(spark, dir, "documents"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("distributed trainer == scalar reference, merge for merge") {
    val expected = scalarTrain(wordCounts, 20)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    val got = graft.queries.TextQ.bpeTrain(spark, dir).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.size == 20, "the corpus must sustain 20 merges")
  }

  /** 400 deterministic pseudo-words (seeded LCG, no RNG state) — the
    * corpus vocabulary alone exhausts at 105 merges; deep-parity tests
    * need a vocabulary that sustains 200+.
    */
  private def pseudoWords: Map[String, Long] = (0 until 400).map { i =>
    var x = i.toLong * 0x9E3779B97F4A7C15L
    val len = 5 + (i % 7)
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      sb += ('a' + ((x >>> 33) % 26)).toChar
    }
    sb.toString -> (1L + (i % 97))
  }.toMap

  test("trainBatched == scalar reference at 200 merges (and == train), " +
      "in far fewer distributed passes") {
    import spark.implicits._
    // the r15 capability gate: exact parity DEEP into training, where
    // ties, created-symbol interference and vocab collisions actually
    // occur — a wrong batch rule cannot survive 200 table-for-table rows
    val deep = (wordCounts.toSeq ++ pseudoWords.toSeq)
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val expected = scalarTrain(deep, 200)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    assert(expected.size == 200, s"vocab sustains only ${expected.size}")
    val deepDf = deep.toSeq.toDF("word", "n")
    val got = Bpe.trainBatched(deepDf, 200).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // the raw corpus EXHAUSTS at 105: the batched trainer must stop at
    // the same point with the same table, and agree with the
    // sequential distributed trainer at the q_bpe_train depth
    val words = Bpe.wordCounts(graft.Tables(spark, dir, "documents"), "text")
    val corpusExpected = scalarTrain(wordCounts, 200)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    assert(corpusExpected.size == 105,
      s"corpus depth moved: ${corpusExpected.size}")
    val corpusGot = Bpe.trainBatched(words, 200).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(corpusGot == corpusExpected)
    val seq20 = Bpe.train(words, 20).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(corpusGot.take(20) == seq20)
  }

  test("trainIncremental == scalar reference at 200 merges (and == " +
      "trainBatched at the exhaustion point)") {
    import spark.implicits._
    // the same deep-parity gate as trainBatched: exact table-for-table
    // agreement where ties, created-symbol interference and vocab
    // collisions occur — a drifted delta count or a stale-heap bug
    // cannot survive 200 rows of (rank, left, right, COUNT)
    val deep = (wordCounts.toSeq ++ pseudoWords.toSeq)
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val expected = scalarTrain(deep, 200)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    val deepDf = deep.toSeq.toDF("word", "n")
    val got = Bpe.trainIncremental(deepDf, 200).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // corpus exhaustion: must stop at the same 105-merge point with the
    // same table as the batched trainer
    val words = Bpe.wordCounts(graft.Tables(spark, dir, "documents"), "text")
    val corpusExpected = scalarTrain(wordCounts, 200)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    val corpusGot = Bpe.trainIncremental(words, 200).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(corpusGot == corpusExpected)
    assert(corpusGot.size == 105)
  }

  test("trainIncremental == scalar reference on adversarial " +
      "tiny-alphabet corpora (deltas under constant interference)") {
    import spark.implicits._
    // tiny alphabets maximize count-update churn: every merge touches
    // a large fraction of words, counts rise and fall repeatedly (the
    // stale-heap duplicate case), and created symbols collide with
    // existing vocabulary — the hardest regime for the delta maps
    var x = 0xBADC0FFEL
    def nxt(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % n).toInt
    }
    for (trial <- 0 until 6) {
      val alpha = "abc".take(2 + trial % 2)
      val words = (0 until 14).map { _ =>
        val len = 2 + nxt(6)
        (0 until len).map(_ => alpha(nxt(alpha.length))).mkString
      }.distinct.map(w => w -> (1L + nxt(9))).toMap
      val expected = scalarTrain(words, 40)
        .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      val df = words.toSeq.toDF("word", "n")
      val batch = if (trial % 2 == 0) 3 else 48
      val got = Bpe.trainIncremental(df, 40, maxBatch = batch)
        .orderBy(col("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(got == expected,
        s"trial $trial (maxBatch=$batch, words=${words.keys.toSeq.sorted})")
    }
  }

  test("trainBatched == scalar reference on adversarial tiny-alphabet " +
      "corpora (ties, created-symbol and same-concat interference)") {
    import spark.implicits._
    // tiny alphabets make multi-character symbols collide constantly:
    // deep training over {a,b,c} exercises every prefix-acceptance
    // clause, including the r16 same-concat rule (two batch members
    // whose concatenations name the SAME new symbol, e.g. ("a","bc")
    // and ("ab","c") — symbol-disjoint, but their creations conflate).
    // A seeded LCG (no RNG state) generates the corpora; small
    // maxBatch values force many batch boundaries.
    var x = 0xDEADBEEFL
    def nxt(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % n).toInt
    }
    for (trial <- 0 until 6) {
      val alpha = "abc".take(2 + trial % 2)
      val words = (0 until 14).map { _ =>
        val len = 2 + nxt(6)
        (0 until len).map(_ => alpha(nxt(alpha.length))).mkString
      }.distinct.map(w => w -> (1L + nxt(9))).toMap
      val expected = scalarTrain(words, 40)
        .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      val df = words.toSeq.toDF("word", "n")
      val batch = if (trial % 2 == 0) 3 else 48
      val got = Bpe.trainBatched(df, 40, maxBatch = batch)
        .orderBy(col("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(got == expected,
        s"trial $trial (maxBatch=$batch, words=${words.keys.toSeq.sorted})")
    }
  }

  test("trainDriver == scalar reference at 200 merges, exhaustion, " +
      "and adversarial tiny-alphabet corpora; trainAuto gates on size") {
    import spark.implicits._
    // the r17 job-latency path: the indexed driver trainer must be
    // table-for-table identical to the same scalar reference that pins
    // the three distributed trainers — deep (ties/interference), at the
    // corpus exhaustion point, and under tiny-alphabet churn where the
    // occurrence index and lazy heap are stressed hardest
    val deep = (wordCounts.toSeq ++ pseudoWords.toSeq)
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val expected = scalarTrain(deep, 200)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    val got = Bpe.trainDriver(deep.toSeq.toDF("word", "n"), 200)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // corpus exhaustion at 105, same table
    val words = Bpe.wordCounts(graft.Tables(spark, dir, "documents"), "text")
    val corpusExpected = scalarTrain(wordCounts, 200)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    val corpusGot = Bpe.trainDriver(words, 200).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(corpusGot == corpusExpected && corpusGot.size == 105)
    // tiny-alphabet churn (same seeded trials as the distributed pins)
    var x = 0x5EEDFACEL
    def nxt(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % n).toInt
    }
    for (trial <- 0 until 6) {
      val alpha = "abc".take(2 + trial % 2)
      val tw = (0 until 14).map { _ =>
        val len = 2 + nxt(6)
        (0 until len).map(_ => alpha(nxt(alpha.length))).mkString
      }.distinct.map(w => w -> (1L + nxt(9))).toMap
      val exp = scalarTrain(tw, 40)
        .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      val g = Bpe.trainDriver(tw.toSeq.toDF("word", "n"), 40)
        .orderBy(col("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(g == exp, s"trial $trial (words=${tw.keys.toSeq.sorted})")
    }
    // trainAuto: same table through BOTH sides of the size gate
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(rows(Bpe.trainAuto(words, 20)) == corpusExpected.take(20))
    assert(rows(Bpe.trainAuto(words, 20, driverMaxWords = 0L)) ==
      corpusExpected.take(20)) // forced spill-over → incremental path
  }

  test("utf8Lt orders like Spark strings, incl. supplementary chars") {
    import spark.implicits._
    // the tie-break comparator must equal UTF8String order: U+FFFD
    // (BMP, 3-byte UTF-8) sorts BELOW U+10400 (supplementary, 4-byte)
    // in code-point order, but Java compareTo says the OPPOSITE
    // (surrogate D801 < FFFD) — pin against Spark's own sort
    val ss = Seq("a", "b", "ab", "�", new String(Character.toChars(0x10400)),
      "</w>", "z</w>", "", "aa")
    val sparkSorted = ss.toDF("s").orderBy(col("s"))
      .collect().map(_.getString(0)).toSeq
    val ours = ss.sortWith(Bpe.utf8Lt)
    assert(ours == sparkSorted)
    assert(new String(Character.toChars(0x10400)).compareTo("�") < 0,
      "Java order must actually differ here, or the pin proves nothing")
  }

  test("encodeWords round-trips and matches the scalar fold") {
    import spark.implicits._
    val merges = scalarTrain(wordCounts, 20).map { case (l, r, _) => (l, r) }
    val words = wordCounts.keys.toSeq.toDF("word")
    val got = Bpe.encodeWords(words, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet == wordCounts.keySet)
    for ((w, toks) <- got) {
      assert(toks.mkString("").stripSuffix(Bpe.Eow) == w,
        s"round-trip failed for '$w'")
      // scalar greedy fold over the same merges must agree
      val ref = merges.foldLeft(w.split("").toVector :+ Bpe.Eow) {
        case (ss, (l, r)) =>
          ss.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
            else acc :+ x
          }
      }
      assert(toks == ref, s"encode mismatch for '$w'")
    }
  }

  test("BpeFixture drift guard: pinned merges == distributed trainer == " +
      "scalar reference; pinned word encodings == the real encode fold") {
    import spark.implicits._
    val fx = graft.text.BpeFixture
    val counts = Bpe.wordCounts(fx.df(spark), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == fx.wordToks.map(_._1).toSet,
      "pinned word list must cover the fixture vocabulary exactly")
    // the pins came from the trainer; the SCALAR reference breaks the
    // circle (an engine bug and its pin would have to agree with an
    // independent from-scratch implementation to slip through)
    val scalar = scalarTrain(counts, 12)
      .zipWithIndex.map { case ((l, r, c), i) => (i + 1L, l, r, c) }
    assert(scalar == fx.merges)
    val dist = Bpe.train(Bpe.wordCounts(fx.df(spark), "text"), 12)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(dist == fx.merges)
    val enc = Bpe.encodeWords(counts.keys.toSeq.toDF("word"), fx.mergePairs)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).size.toLong)
      .toMap
    assert(enc == fx.wordToks.toMap)
    // and the fixture is non-trivial: merged singles AND unmerged runs
    assert(fx.wordToks.toMap.apply("low") == 1L)
    assert(fx.wordToks.exists(_._2 >= 5L))
  }

  test("mergeOnce is greedy left-to-right non-overlapping") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"), Seq("x"))
      .toDF("s")
    val got = df.select(Bpe.mergeOnce(col("s"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("aa", "a"), List("a", "b", "a", "b"), List("x")))
    val got2 = df.select(Bpe.mergeOnce(col("s"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got2 == List(List("a", "a", "a"), List("ab", "ab"), List("x")))
  }

  test("encodeStats: token counts are consistent with the encoded vocab") {
    val merges = scalarTrain(wordCounts, 20).map { case (l, r, _) => (l, r) }
    val docs = graft.Tables(spark, dir, "documents")
    val got = Bpe.encodeStats(docs, "doc_id", "text", merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == docs.count())
    // scalar recompute of one document's stats
    val encoded = merges.foldLeft(
      wordCounts.keys.map(w => w -> (w.split("").toVector :+ Bpe.Eow)).toMap) {
      case (m, (l, r)) => m.map { case (w, ss) =>
        w -> ss.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      }
    }
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, nWords, nBpe) <- got.take(20)) {
      val ws = texts(id).toLowerCase.replaceAll("[^a-z0-9]+", " ")
        .trim.split(" ").toSeq
      assert(nWords == ws.size, s"doc $id word count")
      assert(nBpe == ws.map(w => encoded(w).size.toLong).sum,
        s"doc $id bpe count")
    }
  }
}
