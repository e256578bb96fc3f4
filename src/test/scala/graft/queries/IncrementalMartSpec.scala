package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Incremental-view-maintenance contract: merging the persisted
  * grain-level state with the delta reproduces the full recompute
  * EXACTLY — at the default cut and at both degenerate cuts (empty
  * state / empty delta), where the artifact round-trips a zero-row
  * parquet frame.
  */
class IncrementalMartSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getDate(0).toString, r.getString(1),
      r.getLong(2), r.getDouble(3), r.getLong(4))).toSet

  private lazy val full = rows(Core.martDailySales(spark, dir))

  test("incremental == full recompute at the default cut") {
    assert(rows(Core.martDailySalesIncremental(spark, dir)) == full)
    assert(full.nonEmpty)
  }

  test("degenerate cuts: empty state and empty delta both reproduce full") {
    // cut before all data: state is a zero-row artifact, delta is all
    assert(rows(Core.martDailySalesIncremental(
      spark, dir, "1990-01-01", "mart-state-early")) == full)
    // cut after all data: delta is empty, the mart reads as pure state
    assert(rows(Core.martDailySalesIncremental(
      spark, dir, "2005-01-01", "mart-state-late")) == full)
  }

  test("same artifact name with different cuts must not share state") {
    // the artifact key includes the cut: a reused NAME with a moved cut
    // must rebuild state for the new cut, not merge stale state with
    // the new delta (which would silently drop the in-between rows)
    assert(rows(Core.martDailySalesIncremental(
      spark, dir, "1996-01-01", "mart-state-moving")) == full)
    assert(rows(Core.martDailySalesIncremental(
      spark, dir, "1999-01-01", "mart-state-moving")) == full)
  }
}
