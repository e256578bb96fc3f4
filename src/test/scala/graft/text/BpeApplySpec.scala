package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec


/** Pins [[graft.functions.BpeApplyMerges]] element-for-element against the
  * [[Bpe.mergeOnce]] fold chain it replaced (r18): same greedy
  * left-to-right non-overlapping apply, same rank order across a
  * batch, same null-element pass-through, same null-array result.
  */
class BpeApplySpec extends AnyFunSuite with SparkSpec {

  private def foldChain(c: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]) =
    merges.foldLeft(c) { case (acc, (l, r)) => Bpe.mergeOnce(acc, l, r) }

  test("native batch apply ≡ the mergeOnce fold chain") {
    import spark.implicits._
    val rows = Seq(
      Seq("a", "a", "a"),                      // overlap: greedy non-overlap
      Seq("a", "b", "a", "b", "c"),            // repeated pair
      Seq("x"),                                // single symbol, no pairs
      Seq.empty[String],                       // empty array
      Seq("a", "b", "c", "d", "e", "f"),       // chained batch members
      Seq("ab", "c", "a", "b"),                // pre-existing concat symbol
      Seq("α", "β", "α", "β"),                 // non-ASCII
      Seq("q", "r", "s")                       // batch misses entirely
    ).toDF("s")
    val merges = Seq("a" -> "a", "a" -> "b", "ab" -> "c", "c" -> "d",
      "α" -> "β")
    val got = rows.select(
      graft.functions.BpeApplyMerges.ofColumn(col("s"), merges).as("native"),
      foldChain(col("s"), merges).as("fold")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} != fold ${r.getSeq[String](1)}")
    }
  }

  test("null elements pass through; null array is null; rank order") {
    val rows = spark.sql(
      """select array('a', cast(null as string), 'b', 'a', 'b') as s
        |union all select cast(null as array<string>) as s""".stripMargin)
    val merges = Seq("a" -> "b", "ab" -> "ab")
    val got = rows.select(
      graft.functions.BpeApplyMerges.ofColumn(col("s"), merges).as("native"),
      foldChain(col("s"), merges).as("fold")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // the null element blocks (a,b) around it, merges the trailing pair;
    // then (ab,ab) finds no adjacency — order matters
    val one = got.find(!_.isNullAt(0)).get
    assert(one.getSeq[String](0) == Seq("a", null, "b", "ab"))
  }

  test("an interpreted-eval row (no codegen) matches codegen output") {
    val merges = Seq("a" -> "b")
    val packed = graft.functions.BpeApplyMerges.pack(merges)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a"),
        org.apache.spark.unsafe.types.UTF8String.fromString("b"),
        org.apache.spark.unsafe.types.UTF8String.fromString("a")))
    val out = graft.functions.BpeApplyMerges.applyAll(arr, packed)
    assert(out.numElements() == 2)
    assert(out.getUTF8String(0).toString == "ab")
    assert(out.getUTF8String(1).toString == "a")
  }
}
