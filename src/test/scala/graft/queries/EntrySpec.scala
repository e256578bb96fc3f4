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

  test("expectedNoOracle is EXACTLY the oracle-less query set") {
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = SparkEntry.expectedNoOracle.keySet
    assert(actual -- expected === Set.empty,
      s"queries missing an oracle WITHOUT a registered justification: " +
        s"${actual -- expected} — add an oracleSql entry, or register " +
        "the approximate-by-design justification in expectedNoOracle")
    assert(expected -- actual === Set.empty,
      s"stale expectedNoOracle entries (query now oracled or gone): " +
        s"${expected -- actual}")
  }

  test("every expectedNoOracle justification names real coverage") {
    // the registry's point is a VERIFIABLE pointer: a named fixture twin
    // must be a registered, ORACLED query, and a named spec must exist
    // as a test source file — otherwise the justification is prose.
    val twinRe = "q_[a-z0-9_]+".r
    val specRe = "[A-Z][A-Za-z0-9]*Spec".r
    SparkEntry.expectedNoOracle.foreach { case (name, why) =>
      val twins = twinRe.findAllIn(why).toSet - name
      val specs = specRe.findAllIn(why).toSet
      assert(twins.nonEmpty || specs.nonEmpty,
        s"$name: justification names neither a twin query nor a spec")
      twins.filter(_.endsWith("_fixture")).foreach { t =>
        assert(SparkEntry.oracleSql.contains(t),
          s"$name: named fixture twin $t is not an oracled query")
      }
      specs.foreach { s =>
        // resolve against user.dir so a non-repo-root test JVM fails
        // with a clear message, and close the walk stream (file-handle
        // leak per assertion otherwise)
        val root = java.nio.file.Paths.get(
          sys.props("user.dir"), "src", "test", "scala", "graft")
        assert(java.nio.file.Files.isDirectory(root),
          s"test source root $root not found — run tests from the repo root")
        val walk = java.nio.file.Files.walk(root)
        val found =
          try walk.anyMatch(p => p.getFileName.toString == s"$s.scala")
          finally walk.close()
        assert(found, s"$name: named spec $s.scala not found under src/test")
      }
    }
  }
}
