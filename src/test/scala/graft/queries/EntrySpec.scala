package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.testkit.SparkSpec

/** The driver contract's remaining untested surface: `entry` must
  * return rows, and every `oracleSql` key must name a registered query
  * (an orphaned oracle would silently never be checked).
  */
class EntrySpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
