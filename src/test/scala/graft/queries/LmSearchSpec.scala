package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Differential tests for the bigram-LM scorer and BM25 search: both are
  * recomputed from first principles in plain Scala (BigDecimal mirroring
  * the round-to-6dp-then-exact-sum contract) over the sf0.001 corpus and
  * must match the distributed result EXACTLY — the same bar the DuckDB
  * oracle holds them to, but with an independent third implementation.
  */
class LmSearchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The suite's normalization/tokenization, scalar form. */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").toSeq

  private def round6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private lazy val docs: Seq[(Long, Seq[String])] = {
    import org.apache.spark.sql.functions.col
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), toks(r.getString(1)))).toSeq
  }

  test("lmScore matches a from-scratch Scala bigram LM exactly") {
    val grams = docs.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, p.mkString(" "), p.head))
    }
    val cb = grams.groupBy(_._2).view.mapValues(_.size).toMap
    val cp = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val v = docs.flatMap(_._2).distinct.size
    val expected = grams.groupBy(_._1).map { case (id, gs) =>
      val slp = gs.map { case (_, big, prev) =>
        round6(math.log((cb(big) + 1).toDouble / (cp(prev) + v).toDouble))
      }.sum
      val avg = slp.toDouble / gs.size.toDouble
      id -> (gs.size.toLong, avg, round6(math.exp(-avg)).toDouble, avg >= -3.45)
    }
    val got = TextQ.lmScore(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))
    }.toMap
    assert(got.size == expected.size && got.nonEmpty)
    for ((id, e) <- expected) assert(got(id) == e, s"doc $id")
  }

  test("dsirWeights matches a from-scratch two-LM importance recompute") {
    val grams = docs.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, p.mkString(" "), p.head))
    }
    val (tg, rg) = grams.partition(_._1 % 10 == 3)
    val cbT = tg.groupBy(_._2).view.mapValues(_.size).toMap
    val cpT = tg.groupBy(_._3).view.mapValues(_.size).toMap
    val cbR = rg.groupBy(_._2).view.mapValues(_.size).toMap
    val cpR = rg.groupBy(_._3).view.mapValues(_.size).toMap
    val vT = docs.filter(_._1 % 10 == 3).flatMap(_._2).distinct.size
    val vR = docs.filter(_._1 % 10 != 3).flatMap(_._2).distinct.size
    val expected = rg.groupBy(_._1).map { case (id, gs) =>
      val sdiff = gs.map { case (_, big, prev) =>
        round6(math.log((cbT.getOrElse(big, 0) + 1).toDouble /
          (cpT.getOrElse(prev, 0) + vT).toDouble)) -
          round6(math.log((cbR(big) + 1).toDouble /
            (cpR(prev) + vR).toDouble))
      }.sum
      val lr = sdiff.toDouble / gs.size.toDouble
      id -> (gs.size.toLong, lr, lr >= -0.15)
    }
    val got = TextQ.dsirWeights(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))
    }.toMap
    assert(got.size == expected.size && got.nonEmpty)
    // the target slice itself is never scored
    assert(got.keys.forall(_ % 10 != 3))
    for ((id, e) <- expected) assert(got(id) == e, s"doc $id")
  }

  test("tokenDrift matches a from-scratch two-divergence recompute") {
    import org.apache.spark.sql.functions.col
    val bySource: Map[String, Seq[String]] = graft.Tables(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), toks(r.getString(1)))).toSeq
      .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    val ct = bySource.values.flatten.toSeq.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nC = ct.values.sum
    val expected = bySource.map { case (src, ts) =>
      val st = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nS = ts.size.toLong
      val klnum = st.map { case (t, cSt) =>
        round6(math.log((cSt * nC).toDouble / (nS * ct(t)).toDouble)) * cSt
      }.sum
      val kl = klnum.toDouble / nS.toDouble
      val tvPresent = st.map { case (t, cSt) =>
        math.abs(cSt * nC - ct(t) * nS)
      }.sum
      // keysIterator, not keys: Set.map would dedup colliding counts
      val cctSum = st.keysIterator.map(ct).sum
      val tv = (tvPresent + nS * (nC - cctSum)).toDouble /
        (2.0 * nS.toDouble * nC.toDouble)
      src -> (nS, st.size.toLong, kl, tv)
    }
    val got = TextQ.tokenDrift(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))
    }.toMap
    assert(got.size == expected.size && got.nonEmpty)
    for ((src, e) <- expected) assert(got(src) == e, s"source $src")
    // TV is a metric in [0,1]; a uniform corpus would make every KL 0 —
    // assert the fixture actually drifts
    assert(got.values.forall { case (_, _, kl, tv) =>
      kl >= 0.0 - 1e-9 && tv >= 0.0 && tv <= 1.0 } &&
      got.values.exists(_._4 > 0.0))
  }

  test("bm25 matches a from-scratch Scala BM25 exactly (top-10)") {
    val terms = SearchQ.terms.toSet
    val n = docs.size
    val avgdl = docs.map(_._2.size.toLong).sum.toDouble / n.toDouble
    val perDoc = docs.flatMap { case (id, ts) =>
      val tfs = ts.filter(terms).groupBy(identity).view.mapValues(_.size)
      if (tfs.isEmpty) None
      else Some(id -> tfs.toSeq)
    }
    val dfm = perDoc.flatMap(_._2.map(_._1)).groupBy(identity)
      .view.mapValues(_.size).toMap
    val scored = perDoc.map { case (id, tfs) =>
      val dl = docs.find(_._1 == id).get._2.size
      val sw = tfs.map { case (t, tf) =>
        val idf = math.log(1.0 + ((n - dfm(t)).toDouble + 0.5) /
          (dfm(t).toDouble + 0.5))
        round6(idf * (tf.toDouble * 2.2) /
          (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
      }.sum
      (id, tfs.size.toLong, sw.toDouble)
    }
    val expected = scored.sortBy { case (id, _, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, nt, s), i) => (i + 1L, id, nt, s) }
    val got = SearchQ.bm25Search(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("hybrid RRF fusion matches a scalar fold of the two rank lists") {
    import org.apache.spark.sql.functions.col
    val kEach = 20
    // upstream lists: bm25 is differentially pinned above; the dense
    // brute-force ranking is DuckDB-oracled (q_ann_topk)
    val sparse = SearchQ.bm25(spark, dir, SearchQ.terms, kEach).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val emb = graft.Tables(spark, dir, "embeddings")
    val dense = graft.ann.Ann.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0L), "vec_id", "embedding", kEach)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    val expected = (sparse.keySet ++ dense.keySet).toSeq.map { id =>
      val rrf = sparse.get(id).map(r => 1.0 / (60L + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60L + r)).getOrElse(0.0)
      (id, sparse.getOrElse(id, -1L), dense.getOrElse(id, -1L),
        round6(rrf).toDouble)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, rs, rd, s), i) => (i + 1L, id, rs, rd, s) }
    val got = SearchQ.hybridSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq.sortBy(_._1)
    assert(got == expected)
    // the fused list genuinely mixes: at least one doc from each list
    // survives, and at least one is single-list (rank -1 on one side)
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
    assert(got.exists(t => t._3 == -1L || t._4 == -1L))
  }

  test("charEntropy matches a from-scratch scalar recompute exactly") {
    import org.apache.spark.sql.functions.col
    val texts = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ").trim)
    val expected = texts.map { case (id, t) =>
      val counts = t.toSeq.groupBy(identity).view.mapValues(_.size)
      val n = t.length.toLong
      val sum = counts.values.map { k =>
        val p = k.toDouble / n.toDouble
        round6(p * math.log(p))
      }.sum
      (id, n, (-sum).toDouble)
    }.toSet
    val got = TextQ.charEntropy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    // the signal separates: entropies vary across the corpus
    assert(got.map(_._3).size > 1)
  }

  test("bigrams column op: ordered multiset, short docs empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("a b a b", "solo", "").toDF("t")
      .select(graft.text.TextOps.bigrams(
        org.apache.spark.sql.functions.split(col("t"), " ")).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b", "b a", "a b"), Nil, Nil))
  }
}
