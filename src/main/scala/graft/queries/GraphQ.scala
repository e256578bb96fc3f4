package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Barrier.Ops
import graft.dedup.Dedup
import graft.ops.LabelProp

/** Graph workloads over the similarity graph the dedup family already
  * builds — here, weak supervision: propagate a small labeled seed
  * slice across embedding-similarity edges.
  */
object GraphQ {

  /** q_label_prop: 20% of the corpus keeps its gold label (vec_id % 5
    * == 0 — the deterministic "hand-labeled slice"), the rest start
    * unlabeled; labels propagate 2 synchronous seed-clamped rounds over
    * the cosine ≥ 0.25 graph. NULL-free output (-1 = unlabeled) keeps
    * the oracle compare dtype-stable.
    *
    * The edge list is materialized ONCE (localCheckpoint) and reused by
    * both rounds — at 100 TB the pair scan dominates and must not be
    * re-planned per round. Everything downstream is integer counting,
    * so the whole graph algorithm is DuckDB-oracled exactly.
    */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val seeds = emb.select(col("vec_id").as("id"),
      when(col("vec_id") % 5 === 0, col("label")).as("label"))
    val edges = Dedup.cosinePairsBlocked(emb, "vec_id", "embedding",
        threshold = 0.25)
      .select(col("a_id"), col("b_id"))
      .barrierOnce()
    LabelProp.propagate(seeds, edges, rounds = 2)
      .select(col("id").as("vec_id"),
        coalesce(col("seed_label"), lit(-1)).as("seed_label"),
        coalesce(col("label"), lit(-1)).as("label"))
  }

  /** q_triangles: per-node exact triangle counts over the cosine ≥ 0.25
    * similarity graph — the local-density signal separating clique-like
    * template/boilerplate families (many triangles) from bridge
    * documents (edges but no triangles). Degree-oriented wedge counting
    * ([[graft.ops.TriangleCount]]) is all-integer, so the oracle
    * replays orientation, wedge join and closure exactly.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val edges = Dedup.cosinePairsBlocked(emb, "vec_id", "embedding",
        threshold = 0.25)
      .select(col("a_id"), col("b_id"))
      .barrierOnce()
    graft.ops.TriangleCount.perNode(emb, "vec_id", edges)
      .select(col("node").as("vec_id"), col("triangles"))
  }

  /** q_pagerank: integer fixed-point PageRank over the cosine ≥ 0.25
    * similarity graph, 3 rounds — the centrality signal a curation
    * pipeline uses to pick authoritative cluster representatives and
    * de-weight isolated spam. All-integer arithmetic
    * ([[graft.ops.PageRank]]), so the oracle unrolls the rounds as
    * CTEs and hash-matches exactly, like q_label_prop.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    // checkpoint the PAIR scan before the symmetric union — each union
    // branch would otherwise re-run the dominant all-pairs stage
    val pairs = Dedup.cosinePairsBlocked(emb, "vec_id", "embedding",
        threshold = 0.25)
      .select(col("a_id"), col("b_id"))
      .barrierOnce()
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    graft.ops.PageRank.ranks(emb, "vec_id", edges, rounds = 3)
      .select(col("node").as("vec_id"), col("pr"))
  }
}
