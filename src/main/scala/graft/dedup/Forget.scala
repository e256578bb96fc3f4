package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten (deletion-request) propagation through the
  * persisted curation artifacts — the compliance operator a training-data
  * pipeline needs the day it runs on user data. Deleting documents from
  * the raw corpus is a filter; the expensive question is the DERIVED
  * state: near-dup cluster artifacts, band indexes and the verdicts
  * composed from them all reference the deleted ids, and a full rebuild
  * of the clustering stage per deletion batch is exactly the cost the
  * artifact-per-stage design exists to avoid.
  *
  * The contract for every operator here is incremental ≡ full: the
  * patched artifact must be ROW-IDENTICAL to the artifact rebuilt from
  * scratch on the filtered corpus (the same gate q_incremental_mart and
  * q_scd2_incremental hold, enforced by sharing the full-rebuild DuckDB
  * oracle).
  *
  * Scale shape: work is bounded by the deletion BLAST RADIUS — the
  * clusters that actually contain a deleted doc — never by corpus size.
  * Untouched clusters pass through by one (broadcast-sized) anti-join;
  * only members of affected clusters are re-shingled and re-clustered.
  * At 100 TB with a daily deletion batch of thousands of ids, that is
  * a few thousand affected docs of re-clustering versus a full corpus
  * MinHash + star-contraction pass.
  */
object Forget {

  /** Patch a near-dup cluster-label artifact `(doc_id, cluster_id)`
    * after deleting `deleted` ids (any frame with a `doc_id` column).
    *
    * Deletion only ever REMOVES edges from the near-dup graph, so
    * surviving components are refinements of old clusters: no pair can
    * appear between two previously-separate clusters. That makes the
    * repair local — recompute components ONLY inside affected clusters:
    *
    *  1. affected   = distinct cluster ids containing a deleted doc
    *                  (deletion-batch-sized);
    *  2. survivors  = members of affected clusters minus the deleted
    *                  docs (blast-radius-sized);
    *  3. `pairsAmong(survivors)` — caller-supplied candidate machinery
    *     (MinHash banding for text, pHash bands for images, blocked
    *     cosine for embeddings) re-derives the pair relation among the
    *     survivors only. Pair generation is per-doc content keyed, so
    *     the restriction of the full-corpus pair relation to a doc
    *     subset equals the pair relation computed on the subset;
    *  4. star-contract the surviving sub-graph ([[Dedup.clusterLabels]])
    *     — new min-id labels, split components, re-elected
    *     representatives all fall out;
    *  5. clusters with no deleted member pass through UNTOUCHED via one
    *     anti-join on the (small) affected set.
    *
    * A deleted doc can change its cluster's label (it was the min id),
    * SPLIT the cluster (it was the bridge in a chain), or leave it
    * singleton — all three are just "connected components of the
    * surviving sub-graph", which is why step 4 reuses the shared star
    * contraction instead of special-casing.
    */
  def forgetLabels(labels: DataFrame, deleted: DataFrame,
      pairsAmong: DataFrame => DataFrame, maxIters: Int = 20): DataFrame = {
    val del = deleted.select(col("doc_id")).distinct()
    val affected = labels.join(del, "doc_id")
      .select(col("cluster_id")).distinct()
    val members = labels.join(affected, "cluster_id")
    val survivors = members.join(del, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    val repaired =
      Dedup.clusterLabels(survivors, "doc_id", pairsAmong(survivors), maxIters)
    val untouched = labels.join(affected, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    untouched.unionByName(repaired)
  }

  /** Patch a persisted MinHash band index `(doc, band, bucket)` after a
    * deletion batch: index rows are PER-DOC (a doc's band signatures
    * depend on its own content only), so forgetting is one anti-join —
    * no signatures recompute, and the patched index is row-identical to
    * an index built fresh on the filtered corpus. Incremental ingest
    * against the patched index therefore can never resurrect a deleted
    * doc as a dedup witness (the q_forget_index gate).
    */
  def forgetIndex(index: DataFrame, deleted: DataFrame): DataFrame =
    index.join(deleted.select(col("doc_id").as("doc")).distinct(),
      Seq("doc"), "left_anti")
}
