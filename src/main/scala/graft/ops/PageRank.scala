package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point INTEGER PageRank (Brin & Page 1998) — centrality over
  * the similarity graph, for picking authoritative representatives and
  * down-weighting isolated spam clusters in a curation pipeline.
  *
  * The arithmetic contract is integer throughout, which is what makes a
  * graph algorithm fully ORACLE-able (the [[LabelProp]] lesson): rank
  * mass is parts-per-billion (node 0 starts at 10⁹/N), each round a
  * node ships share = pr div deg to every neighbor (integer division —
  * the dropped remainder is the deterministic price of exactness), and
  * the damping mix is pr' = (15·base) div 100 + (85·inflow) div 100
  * with base = 10⁹/N. Every engine computes identical BIGINTs; no
  * float summation order exists anywhere.
  *
  * Scale shape: one edge⋈rank shuffle + one map-side-combinable
  * inflow sum per round — identical to [[LabelProp]]'s round shape.
  * Degrees are computed once. Rounds are a fixed small constant (the
  * operator is a curation signal, not an eigensolver); overflow head-
  * room: inflow_i ≤ deg_i · 10⁹, so deg up to ~10⁷ stays clear of
  * Long.MaxValue after the ×85.
  */
object PageRank {

  private val Base = 1000000000L // total rank mass, parts-per-billion

  /** (node, pr) after `rounds` synchronous rounds over the SYMMETRIC
    * `edges` (src, dst). Nodes without in-edges keep the teleport term
    * only; dangling nodes simply ship no mass (their remainder is
    * dropped, the standard simplification).
    */
  def ranks(nodes: DataFrame, idCol: String, edges: DataFrame,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val n = nodes.count()
    require(n > 0, "PageRank over an empty node set")
    val base = Base / n
    // degrees once; the per-round joins reuse this tiny frame
    val deg = graft.ops.Barrier.once(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val ids = graft.ops.Barrier.once(nodes.select(col(idCol).as("node")))
    var pr = ids.withColumn("pr", lit(base))
    for (_ <- 1 to rounds) {
      val shares = pr.join(deg, pr("node") === deg("src"))
        .select(col("src"), expr("pr div deg").as("share"))
      val inflow = edges.join(shares, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("inflow"))
      pr = ids.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * base / 100L) +
            expr("coalesce(inflow, 0L) * 85 div 100")).as("pr"))
    }
    pr
  }
}
