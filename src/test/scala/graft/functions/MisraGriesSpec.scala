package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  private def summaryOf(df: org.apache.spark.sql.DataFrame, col0: String, k: Int) = {
    val row = df.select(MisraGries.ofColumn(col(col0), k).as("s")).head()
    val s = row.getStruct(0)
    (s.getMap[String, Long](0).toMap, s.getLong(1))
  }

  test("MG invariants vs exact counts on the real token stream") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
    val exact = toks.groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 32
    val (est, shed) = summaryOf(toks, "t", k)
    // never overcounts; undercounts by at most the tracked shed
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"$t overcounted: $e > ${exact(t)}")
      assert(exact(t) - e <= shed, s"$t undercounted beyond shed")
    }
    // every item heavier than the shed bound survives
    exact.filter(_._2 > shed).keys.foreach(t =>
      assert(est.contains(t), s"heavy item $t missing (true=${exact(t)}, shed=$shed)"))
    // mergeable-summaries bound on the error budget itself
    assert(shed <= n / (k + 1) + 1, s"shed=$shed exceeds N/(k+1)=${n / (k + 1)}")
    assert(est.size <= k, s"summary larger than k: ${est.size}")
  }

  test("a dominant item's estimate is close and ranked first") {
    import spark.implicits._
    val items = (Seq.fill(5000)("hot") ++ (1 to 2000).map(i => s"cold-$i")).toDF("t")
      .repartition(8) // force partial/merge paths
    val (est, shed) = summaryOf(items, "t", k = 16)
    assert(est.contains("hot"))
    assert(est("hot") == est.values.max)
    assert(5000L - est("hot") <= shed)
  }
}
