package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.FuzzyJoin

/** Record-linkage queries: fuzzy entity resolution over the TPC-H
  * `part` names (short "adjective noun" strings — realistic dirty-
  * catalog material).
  */
object LinkQ {

  /** q_fuzzy_join: match parts against a deterministically-corrupted
    * twin catalog (ids offset by 100000; every third name loses its
    * last character — a distance-1 typo; the next third loses two —
    * distance 2, past the threshold; the rest are verbatim). Blocked
    * on the FIRST TOKEN (tail-of-name corruption never reaches it —
    * the stable-field contract) plus the length band; exact
    * levenshtein ≤ 1 verifies inside blocks.
    *
    * Two scale guards, both load-bearing because part names draw from
    * a tiny adjective-noun vocabulary and so duplicate densely:
    * (1) the CLEAN side is pre-deduplicated to distinct names keeping
    * the min id — for a fixed dist every duplicate of a name scores
    * identically, so the (dist, a_id) argmin can only ever pick the
    * min-id representative and dropping the rest is lossless; block
    * sizes then track the distinct-name vocabulary (a constant), not
    * the catalog, making candidate volume LINEAR in the dirty side;
    * (2) the query RESOLVES each dirty record to its single best
    * match (min dist, then min a_id), so the output is bounded by the
    * dirty catalog size. Both engines see the same argmin,
    * deterministically.
    */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
    val left = part.groupBy(col("p_name").as("name"))
      .agg(min(col("p_partkey")).as("id"))
    val right = part.select((col("p_partkey") + 100000).as("id"),
      when(pmod(col("p_partkey"), lit(3)) === 0,
        expr("substring(p_name, 1, length(p_name) - 1)"))
        .when(pmod(col("p_partkey"), lit(3)) === 1,
          expr("substring(p_name, 1, length(p_name) - 2)"))
        .otherwise(col("p_name")).as("name"))
    val pairs = FuzzyJoin.joinByEditDistance(left, right, "id", "name",
      "id", "name",
      blockKey = n => split(n, " ").getItem(0), maxDist = 1)
    // resolve: one best clean match per dirty record — the partitioned
    // window keeps the argmin distributed on b_id
    val best = Window.partitionBy(col("b_id"))
      .orderBy(col("dist"), col("a_id"))
    pairs
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("b_id"), col("a_id").as("match_id"), col("dist"))
  }
}
