package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** Integrity-report contract: a clean relation reports zeros on every
  * check; planted orphans / duplicate keys / domain violations are
  * counted exactly.
  */
class IntegritySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def report(facts: org.apache.spark.sql.DataFrame) = {
    val dims = Seq(10L, 20L, 30L).toDF("dim_key")
    Checks.integrityReport(facts, "k", "fk", dims, "dim_key", "amt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("clean relation: all three checks report zero") {
    val clean = Seq((1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 30L, 7.0))
      .toDF("k", "fk", "amt")
    assert(report(clean) ==
      Map("orphan_fk" -> 0L, "dup_k" -> 0L, "negative_amt" -> 0L))
  }

  test("planted violations are counted exactly") {
    val dirty = Seq(
      (1L, 10L, 5.0), (1L, 10L, 5.0),  // dup key 1 (one dup KEY)
      (2L, 99L, 6.0), (3L, 98L, 6.5),  // two orphan fks
      (4L, 20L, -1.0), (5L, 30L, -2.0), (6L, 30L, 0.0) // two negatives
    ).toDF("k", "fk", "amt")
    assert(report(dirty) ==
      Map("orphan_fk" -> 2L, "dup_k" -> 1L, "negative_amt" -> 2L))
  }

  test("empty relation: zeros, not nulls or exceptions") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "fk", "amt")
    assert(report(empty) ==
      Map("orphan_fk" -> 0L, "dup_k" -> 0L, "negative_amt" -> 0L))
  }
}
