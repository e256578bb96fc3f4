package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) entity-resolution join — the record-
  * linkage primitive: match entities whose names differ by at most
  * `maxDist` single-character edits (typos, truncation, OCR noise)
  * without an N² comparison.
  *
  * Scale shape: candidate generation is a pure EQUI-join on
  * (blocking key, length band). The caller picks the blocking key from
  * a field that edits do not touch (a stable prefix, a phonetic code, a
  * first token); the length band exploits that edit distance ≤ d
  * implies |len(a) − len(b)| ≤ d, so the right side explodes 2d+1
  * length keys and the join shuffles on the composite key — every
  * candidate pair lands in exactly ONE (key, length) bucket (the left
  * length matches a single exploded key, so no dedup pass is needed).
  * The expensive exact `levenshtein` verify runs only inside blocks,
  * the same generate-then-verify contract as
  * [[graft.dedup.Dedup.minhashLshPairs]].
  */
object FuzzyJoin {

  /** Candidate pairs (a_id, b_id, dist) with dist ≤ maxDist, blocked by
    * `blockKey` and the length band. A pair whose names disagree on the
    * blocking key is NOT emitted — the recall contract every blocked
    * linkage has; choose the key on a field edits do not touch.
    */
  def joinByEditDistance(left: DataFrame, right: DataFrame,
      idL: String, nameL: String, idR: String, nameR: String,
      blockKey: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val l = left.select(col(idL).as("a_id"), col(nameL).as("na"))
      .withColumn("bk", blockKey(col("na")))
      .withColumn("lk", length(col("na")))
    val r = right.select(col(idR).as("b_id"), col(nameR).as("nb"))
      .withColumn("bk", blockKey(col("nb")))
      .withColumn("lk", explode(sequence(
        length(col("nb")) - maxDist, length(col("nb")) + maxDist)))
    l.join(r, Seq("bk", "lk"))
      .withColumn("dist", levenshtein(col("na"), col("nb")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
  }
}
