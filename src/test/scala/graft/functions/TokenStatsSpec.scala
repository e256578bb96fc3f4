package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec
import graft.text.TextOps

class TokenStatsSpec extends AnyFunSuite with SparkSpec {

  test("char total and marker hits match the HOF folds on the documents table") {
    val sets = Seq(TextOps.stopwords) ++ TextOps.langMarkers.map(_._2)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val refCols = TextOps.totalTokenChars(col("toks")).as("ref_chars") +:
      sets.zipWithIndex.map { case (s, i) =>
        size(filter(col("toks"), t => array_contains(lit(s.toArray), t)))
          .cast("long").as(s"ref_h$i")
      }
    val both = docs.select(
      (col("doc_id") +: TokenStats.ofColumn(col("toks"), sets).as("st") +:
        refCols): _*)
    val preds = (col("ref_chars") <=> element_at(col("st"), 1)) +:
      sets.indices.map(i =>
        col(s"ref_h$i") <=> element_at(col("st"), i + 2))
    assert(both.filter(not(preds.reduce(_ && _))).count() == 0)
  }

  test("null plumbing: null token nulls the char sum, skips hit counts") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[String]](Some("the"), None, Some("cat")))),
      (2L, None)).toDF("id", "toks")
    val r = df.orderBy("id")
      .select(TokenStats.ofColumn(col("toks"), Seq(Seq("the", "cat"))))
      .collect()
    val row = r(0).getSeq[Any](0)
    assert(row(0) == null) // length fold null-poisoned
    assert(row(1) == 2L)   // array_contains skips the null token
    assert(r(1).isNullAt(0))
  }
}
