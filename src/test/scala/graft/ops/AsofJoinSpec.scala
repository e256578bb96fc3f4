package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

class AsofJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val trades = Seq(
    (1L, "A", 100L),
    (2L, "A", 105L),
    (3L, "A", 103L), // out of order is fine: window sorts
    (4L, "B", 50L))
    .toDF("trade_id", "sym", "ts")

  private val quotes = Seq(
    (10L, "A", 99L, 1.0),
    (11L, "A", 103L, 2.0), // exactly at trade 3's ts: inclusive
    (12L, "B", 60L, 9.0)) // after B's only trade: never matches
    .toDF("quote_id", "sym", "ts", "px")

  test("latest at-or-before row per key; null when nothing precedes") {
    val out = AsofJoin.lastBefore(trades, quotes,
      keyCols = Seq("sym"), tsCol = "ts",
      payload = Seq("quote_id", "px"), tieCol = "quote_id")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[java.lang.Long]("asof_quote_id")),
          Option(r.getAs[java.lang.Double]("asof_px")))).toMap
    assert(out(1L) == (Some(10L), Some(1.0))) // 99 <= 100
    assert(out(2L) == (Some(11L), Some(2.0))) // 103 <= 105
    assert(out(3L) == (Some(11L), Some(2.0))) // inclusive boundary
    assert(out(4L) == (None, None)) // quote is after the trade
  }

  test("NULL keys never match (SQL join semantics), left row still emits") {
    val t = Seq((1L, Option("A"), 100L), (2L, None: Option[String], 100L))
      .toDF("trade_id", "sym", "ts")
    val q = Seq((10L, Option("A"), 50L, 1.0), (11L, None: Option[String], 50L, 9.0))
      .toDF("quote_id", "sym", "ts", "px")
    val out = AsofJoin.lastBefore(t, q,
      keyCols = Seq("sym"), tsCol = "ts",
      payload = Seq("quote_id"), tieCol = "quote_id")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("asof_quote_id"))).toMap
    assert(out(1L) == Some(10L))
    assert(out(2L) == None) // NULL = NULL is not a match
  }

  test("payload fields always come from the SAME right row, even with nulls") {
    val quotesWithNull = Seq(
      (10L, "A", 99L, Some(1.0)),
      (11L, "A", 103L, None: Option[Double])) // later row, null px
      .toDF("quote_id", "sym", "ts", "px")
    val out = AsofJoin.lastBefore(
      trades.filter($"trade_id" === 2L), quotesWithNull,
      keyCols = Seq("sym"), tsCol = "ts",
      payload = Seq("quote_id", "px"), tieCol = "quote_id")
      .head()
    // per-column carry would pair quote 11's id with quote 10's px
    assert(out.getAs[Long]("asof_quote_id") == 11L)
    assert(out.isNullAt(out.fieldIndex("asof_px")))
  }
}
