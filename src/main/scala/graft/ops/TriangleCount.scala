package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over the similarity graph — the local
  * clustering signal of corpus curation: a document embedded in many
  * triangles sits inside a densely inter-similar clique (template spam,
  * boilerplate families), while bridge documents with edges but no
  * triangles connect otherwise-unrelated regions.
  *
  * Algorithm: degree-ordered edge orientation (Chiba–Nishizeki /
  * Schank–Wagner "forward" counting, the MapReduce-standard form from
  * Suri & Vassilvitskii 2011). Every undirected edge is directed from
  * its lexicographically smaller (degree, id) endpoint to the larger;
  * each triangle then has EXACTLY one vertex with out-edges to the
  * other two, so counting (u→v, u→w, v–w closed) wedges counts each
  * triangle once — no division by 3, no double counting, and all
  * arithmetic is integer, which makes the whole operator
  * DuckDB-oracle-able (the [[LabelProp]] / [[PageRank]] lesson).
  *
  * Scale shape: orientation bounds out-degree by O(√|E|) regardless of
  * how skewed the raw degree distribution is — the wedge self-join
  * (the quadratic step) explodes per-OUT-degree, so a celebrity node
  * with 10⁶ neighbors costs √-bounded wedges instead of 10¹² pairs.
  * Three content-key shuffles total: degrees, the wedge join on u, and
  * the closing semi-join on the canonical (min, max) edge key.
  */
object TriangleCount {

  /** Per-node triangle participation counts.
    *
    * @param nodes one row per vertex; `idCol` names the id column
    * @param edges undirected UNIQUE pairs (a_id, b_id), a_id < b_id —
    *              the canonical form [[graft.dedup.Dedup.cosinePairsBlocked]]
    *              emits
    * @return (node, triangles) — every input vertex, 0 where none
    */
  def perNode(nodes: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    // orient each edge from the smaller (deg, id) endpoint to the larger;
    // ids break degree ties, so orientation is total and deterministic
    val oriented = edges
      .join(deg.select(col("src").as("a_id"), col("deg").as("da")), "a_id")
      .join(deg.select(col("src").as("b_id"), col("deg").as("db")), "b_id")
      .select(
        when(struct(col("da"), col("a_id")) < struct(col("db"), col("b_id")),
          col("a_id")).otherwise(col("b_id")).as("u"),
        when(struct(col("da"), col("a_id")) < struct(col("db"), col("b_id")),
          col("b_id")).otherwise(col("a_id")).as("v"))
    // out-neighbor pairs of each center u, each unordered pair once
    val x = oriented.select(col("u"), col("v").as("v1"))
    val y = oriented.select(col("u"), col("v").as("v2"))
    val wedges = x.join(y, Seq("u")).filter(col("v1") < col("v2"))
    // close the wedge against the canonical undirected edge key
    val tri = wedges.join(edges,
      least(col("v1"), col("v2")) === col("a_id") &&
        greatest(col("v1"), col("v2")) === col("b_id"))
      .select(col("u"), col("v1"), col("v2"))
    val perVertex = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    nodes.select(col(idCol).as("node"))
      .join(perVertex, Seq("node"), "left")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
