package graft.etl

import scala.util.hashing.MurmurHash3

/** Failure-injection scenario ADT (reference: §2.8 of SURVEY.md — scenario
  * threaded through every stage via run conf, e.g.
  * airflow/dags/grocery_ingest_dag.py:86).
  *
  * Determinism recipe mirrors grocery_lib/failure.py:24-27 /
  * mock_pos_api/app.py:15-17: seed = hash("runId::scenario") mod 2^32.
  * Python's hash() is PYTHONHASHSEED-dependent so cross-language parity is
  * impossible; MurmurHash3 keeps the recipe and gives within-engine
  * determinism (the actual spec).
  */
sealed abstract class Scenario(val name: String)

object Scenario {
  case object Ok extends Scenario("ok")
  case object TemporalError extends Scenario("temporal_error")
  case object MalformedJson extends Scenario("malformed_json")
  case object SchemaDrift extends Scenario("schema_drift")
  case object PartialWrite extends Scenario("partial_write")
  case object BadData extends Scenario("bad_data")
  case object UpstreamMissing extends Scenario("upstream_missing")
  case object RacePartial extends Scenario("race_partial")
  case object SchemaDriftV2 extends Scenario("schema_drift_v2")
  case object ModelBug extends Scenario("model_bug")
  case object SourceBug extends Scenario("source_bug")
  case object SyntaxBug extends Scenario("syntax_bug")
  case object LogicBug extends Scenario("logic_bug")
  case object DependencyIssue extends Scenario("dependency_issue")

  val all: Seq[Scenario] = Seq(Ok, TemporalError, MalformedJson, SchemaDrift,
    PartialWrite, BadData, UpstreamMissing, RacePartial, SchemaDriftV2,
    ModelBug, SourceBug, SyntaxBug, LogicBug, DependencyIssue)

  def fromName(s: String): Scenario =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown scenario: $s"))

  /** Deterministic non-negative 32-bit seed per (runId, scenario). */
  def seed(runId: String, scenario: String): Long =
    (MurmurHash3.stringHash(s"$runId::$scenario").toLong) & 0xFFFFFFFFL

  /** Deterministic uniform draw in [0, 1) per (runId, scenario, tag) —
    * used for e.g. the temporal_error 0.7 failure gate (app.py:59-65).
    */
  def draw(runId: String, scenario: String, tag: String): Double =
    ((MurmurHash3.stringHash(s"$runId::$scenario::$tag").toLong & 0xFFFFFFFFL).toDouble
      / (1L << 32).toDouble)
}
