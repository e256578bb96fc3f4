package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Incremental SCD2 merge contract: applying the delta batch to the
  * persisted history reproduces the full type-2 rebuild EXACTLY — at
  * the default cut (seed collapse, version continuation, untouched
  * pass-through all in play) and at both degenerate cuts.
  */
class Scd2IncrementalSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
      r.getInt(5))).toSet

  private lazy val full = rows(EventsQ.scd2(spark, dir))

  test("incremental merge == full rebuild at the default cut") {
    assert(rows(EventsQ.scd2Incremental(spark, dir)) == full)
    assert(full.nonEmpty)
    // the cut is real: both open and closed versions exist on each side
    assert(full.exists(_._6 == 1) && full.exists(_._6 == 0))
  }

  test("degenerate cuts: empty history and empty delta both reproduce full") {
    // cut before all events: history is a zero-row artifact, the whole
    // stream is the delta (every key is a no-seed key -> versions from 1)
    assert(rows(EventsQ.scd2Incremental(
      spark, dir, "2020-01-01", "scd2-history-early")) == full)
    // cut after all events: delta is empty, history passes through whole
    assert(rows(EventsQ.scd2Incremental(
      spark, dir, "2030-01-01", "scd2-history-late")) == full)
  }

  test("mid-stream cuts: seeds collapse and versions continue correctly") {
    // several cuts inside the span exercise keys whose first delta row
    // duplicates the open version (collapse) and keys with multi-row
    // version continuation
    for (cut <- Seq("2024-01-08", "2024-01-15", "2024-01-28"))
      assert(rows(EventsQ.scd2Incremental(
        spark, dir, cut, s"scd2-history-$cut")) == full, s"cut=$cut")
  }
}
