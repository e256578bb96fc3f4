package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class TextOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("normalize collapses punctuation and case") {
    val r = docs(1 -> "  Hello,   WORLD!! 42 ")
      .select(TextOps.normalize(col("text"))).head().getString(0)
    assert(r == "hello world 42")
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val r = docs(1 -> "Hi there, 42 cats!")
      .select(
        size(TextOps.tokens(col("text"))),
        TextOps.regexTokenCount(col("text")))
      .head()
    assert(r.getInt(0) == 4) // hi there 42 cats
    assert(r.getInt(1) == 6) // hi | there | , | 42 | cats | !
  }

  test("language ID picks the language with the most marker hits") {
    val r = docs(
      1 -> "the cat and the dog of the house",
      2 -> "der hund und die katze ist nicht da",
      3 -> "el perro y el gato es un animal",
      4 -> "le chien et le chat est dans une maison")
      .select(col("doc_id"),
        TextOps.predictLang(TextOps.langScores(TextOps.tokens(col("text")))))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(r == Map(1 -> "en", 2 -> "de", 3 -> "es", 4 -> "fr"))
  }

  test("chunks: stride windows cover every token, trailing chunk short") {
    val text = (1 to 250).map(i => s"w$i").mkString(" ")
    val cs = docs(1 -> text)
      .select(explode(TextOps.chunks(TextOps.tokens(col("text")), 100, 80)).as("c"))
      .select(col("c.chunk_idx"), col("c.chunk"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    // 1 + ceil((250-100)/80) = 3 chunks; a 4th starting at w241 would be
    // a strict suffix of chunk 2 (duplicate training sample)
    assert(cs.keySet == Set(0L, 1L, 2L))
    assert(cs(0L).head == "w1" && cs(0L).length == 100)
    assert(cs(1L).head == "w81" && cs(1L).length == 100)
    assert(cs(2L).head == "w161" && cs(2L).length == 90) // clamped at end
  }

  test("shingles: distinct 3-grams, short docs empty, dups collapsed") {
    val sh = docs(
      1 -> "a b c d",
      2 -> "a b", // shorter than n
      3 -> "x y x y x y") // repeated shingles collapse
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(sh(1) == List("a b c", "b c d"))
    assert(sh(2) == Nil)
    assert(sh(3) == List("x y x", "y x y"))
  }

  test("rolling hash is order-sensitive, bag hash is order-independent") {
    val df = docs(1 -> "alpha beta gamma", 2 -> "gamma beta alpha")
      .select(
        TextOps.rollingHash(TextOps.normalize(col("text"))).as("content"),
        TextOps.bagHash(TextOps.tokens(col("text"))).as("bag"))
    val Array(a, b) = df.collect()
    assert(a.getLong(0) != b.getLong(0))
    assert(a.getLong(1) == b.getLong(1))
  }

  test("rolling hash matches the hand-computed fold") {
    // "ab": ((0*31+97)*31+98) % 1e9+7 = 3105
    val h = docs(1 -> "ab").select(TextOps.rollingHash(col("text")))
      .head().getLong(0)
    assert(h == 3105L)
  }

  test("identical normalized content yields identical fingerprints") {
    val df = docs(1 -> "Spark is FAST!", 2 -> "spark is fast")
      .select(TextOps.rollingHash(TextOps.normalize(col("text"))))
    val Array(a, b) = df.collect()
    assert(a.getLong(0) == b.getLong(0))
  }

  test("quality signals: stopword ratio and diversity") {
    val toks = TextOps.tokens(col("text"))
    val r = docs(1 -> "the the the cat")
      .select(
        TextOps.wordRatio(toks, TextOps.stopwords),
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      .head()
    assert(r.getDouble(0) == 0.75)
    assert(r.getDouble(1) == 0.5)
  }

  test("PII redaction: categories in order, counts per category, clean text untouched") {
    val df = docs(
      1 -> "mail alice.smith@example.com and bob@mail.org or ping 10.0.0.1 then call +1 415 555-0133 ok",
      2 -> "no pii here at all")
    val redacted = TextOps.piiPatterns.foldLeft(col("text")) {
      case (t, (_, pattern, token)) => TextOps.redact(t, pattern, token)._2
    }
    val out = df.select(col("doc_id"), redacted.as("r")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) ==
      "mail <email> and <email> or ping <ip> then call <phone> ok")
    assert(out(2) == "no pii here at all")
    // counts: emails counted BEFORE redaction of later categories
    val (nEmail, afterEmail) =
      TextOps.redact(col("text"), TextOps.piiPatterns(0)._2, "<email>")
    val (nIp, _) = TextOps.redact(afterEmail, TextOps.piiPatterns(1)._2, "<ip>")
    val counts = df.filter(col("doc_id") === 1)
      .select(nEmail.as("e"), nIp.as("i")).head()
    assert(counts.getLong(0) == 2 && counts.getLong(1) == 1)
  }

  test("cooccurrences: windowed unordered pairs, multiset semantics") {
    import spark.implicits._
    val got = Seq("b a c a").toDF("t")
      .select(TextOps.cooccurrences(split(col("t"), " "), 2).as("p"))
      .collect().head.getSeq[String](0).sorted
    // gap 1: (b,a)(a,c)(c,a); gap 2: (b,c)(a,a) — all token-sorted
    assert(got == Seq("a a", "a b", "a c", "a c", "b c").sorted)
    // window larger than the doc: no out-of-range pairs, no descent
    val short = Seq("x y").toDF("t")
      .select(TextOps.cooccurrences(split(col("t"), " "), 5).as("p"))
      .collect().head.getSeq[String](0)
    assert(short == Seq("x y"))
  }

  test("vocabCoverage matches a driver-side scalar recompute") {
    val dir = "/root/testdata/sf0.001"
    val toks = graft.Tables(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val total = toks.length.toLong
    val expected = Seq(5, 10, 20).map(k =>
      k.toLong -> counts.take(k).map(_._2).sum).toMap
    val got = graft.queries.TextQ.vocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 3)
    got.foreach { case (k, cov, tot, share) =>
      assert(tot == total)
      assert(cov == expected(k), s"k=$k")
      assert(share == cov.toDouble / total.toDouble)
    }
    // the curve is strictly increasing and ends below 1 (vocab > 20)
    val shares = got.sortBy(_._1).map(_._4).toSeq
    assert(shares == shares.sorted && shares.distinct.length == 3)
    assert(shares.last < 1.0)
  }
}
