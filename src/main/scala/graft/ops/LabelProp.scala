package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seed-clamped label propagation (Zhu & Ghahramani's LP / the
  * Raghavan et al. LPA family) over a similarity graph — the
  * weak-supervision workhorse of corpus curation: hand-label (or
  * classifier-label) a small seed slice, connect documents by
  * embedding similarity, and let labels flow to the unlabeled mass.
  *
  * Semantics (deterministic by construction, so the whole operator is
  * DuckDB-oracled — rare for graph algorithms):
  *  - seeds are CLAMPED: a node with a seed label never changes;
  *  - per synchronous round, every unlabeled node takes the MAJORITY
  *    label among its currently-labeled neighbors, ties broken by the
  *    SMALLEST label; nodes with no labeled neighbor keep their state;
  *  - all arithmetic is integer counting — no floats anywhere.
  *
  * Scale shape: each round is one shuffle of the edge list joined to
  * the (id, label) frame, a (dst, label) count aggregation (map-side
  * combinable), and a per-dst top-1 window over the handful of distinct
  * labels a node's neighborhood carries — all keyed on node id, no
  * driver-side state. The edge list is built ONCE by the caller (it is
  * the expensive input at 100 TB — [[graft.dedup.Dedup.cosinePairsBlocked]]
  * or any pair source) and reused across rounds; rounds are a fixed
  * small constant, so plan depth stays bounded without checkpoints.
  */
object LabelProp {

  /** Propagate `rounds` synchronous rounds.
    *
    * @param seeds (id, label) — label NULL on unlabeled nodes
    * @param edges (a_id, b_id) — one row per UNDIRECTED pair
    * @return (id, seed_label, label) after propagation; label NULL where
    *         no labeled node was ever reachable within `rounds` hops
    */
  def propagate(seeds: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be non-negative, got $rounds")
    val sym = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
    val seed = seeds.select(col("id"), col("label").as("seed_label"))
    var labels = seed.withColumn("label", col("seed_label"))
    for (_ <- 1 to rounds) {
      val votes = sym
        .join(labels.select(col("id").as("src"), col("label").as("l")), "src")
        .filter(col("l").isNotNull)
        .groupBy(col("dst").as("id"), col("l"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("id"))
        .orderBy(col("n").desc, col("l"))
      val winner = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("l").as("maj"))
      labels = labels.join(winner, Seq("id"), "left")
        // clamp: seeds keep their label; unlabeled take the majority,
        // falling back to last round's state (possibly still NULL)
        .select(col("id"), col("seed_label"),
          coalesce(col("seed_label"), col("maj"), col("label")).as("label"))
    }
    labels.select(col("id"), col("seed_label"), col("label"))
  }
}
