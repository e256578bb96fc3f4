package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The decode-once / compute-once materialization barrier behind every
  * multi-consumer hot frame (decoded media fingerprints, cluster pair
  * inputs, packing keys): a frame consumed by several joins must be
  * materialized exactly once, or each consumer re-runs the expensive
  * stage that produced it.
  *
  * HOW it materializes is an execution-environment concern, so it is one
  * config instead of a per-site choice:
  *
  *  - `spark.graft.barrier.mode = local` (default): `localCheckpoint()` —
  *    eager, blocks on the executors that computed them, lineage
  *    truncated. The right trade single-JVM (the bench target): zero
  *    replication cost, and an "executor loss" is a JVM loss anyway.
  *  - `replicated`: eager `persist(MEMORY_AND_DISK_2)` — cluster-grade.
  *    Two replicas survive one executor loss (the thing localCheckpoint
  *    turns into an unrecoverable query failure on a real cluster), and
  *    lineage is kept so even double-loss recomputes instead of dying.
  *  - `reliable`: `checkpoint()` to the session's checkpoint dir
  *    (`SparkContext.setCheckpointDir` — HDFS/object store on a
  *    cluster): survives any loss AND truncates lineage; the right mode
  *    for iterative consumers on a long-lived cluster.
  *
  * All three are row-identical by construction (BarrierSpec pins it);
  * only cost and fault-tolerance differ.
  */
object Barrier {

  private def modeOf(df: DataFrame): String =
    df.sparkSession.conf.getOption("spark.graft.barrier.mode")
      .getOrElse("local")

  private def badMode(other: String): Nothing =
    throw new IllegalArgumentException(
      s"spark.graft.barrier.mode: unknown mode '$other' " +
        "(expected local | replicated | reliable)")

  /** Materialize `df` once, per the session's
    * `spark.graft.barrier.mode` (local | replicated | reliable).
    * Eager in every mode — consumers never race the materialization.
    */
  def once(df: DataFrame): DataFrame =
    modeOf(df) match {
      case "local" => df.localCheckpoint()
      case "replicated" =>
        df.persist(StorageLevel.MEMORY_AND_DISK_2)
        df.count() // eager: match localCheckpoint's semantics
        df
      case "reliable" => df.checkpoint()
      case other => badMode(other)
    }

  /** The PER-ROUND barrier for ITERATIVE consumers (star-contraction
    * rounds, BPE merge rounds, PQ/IVF-PQ Lloyd iterations, the
    * streaming novelty pin): every round must truncate lineage, or the
    * plan grows by one round's operators per iteration until analysis
    * itself dominates. That rules `replicated` persist out HERE — it
    * keeps lineage — so the cluster answer for both cluster modes is
    * the reliable `checkpoint()` (files in the session's checkpoint
    * dir survive any executor loss AND truncate lineage), and `local`
    * keeps `localCheckpoint()` (single-JVM, where an executor loss is
    * a JVM loss anyway). Cluster modes therefore require
    * `SparkContext.setCheckpointDir` (HDFS/object store on a real
    * cluster); BarrierSpec pins all modes row-identical.
    */
  def iter(df: DataFrame): DataFrame =
    modeOf(df) match {
      case "local" => df.localCheckpoint()
      case mode @ ("replicated" | "reliable") =>
        // fail FAST with the fix in the message: without this,
        // a missing checkpoint dir surfaces as a generic
        // SparkException deep inside the first iterative loop
        if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            s"Barrier.iter: spark.graft.barrier.mode=$mode maps to " +
              "df.checkpoint(), which requires " +
              "SparkContext.setCheckpointDir (HDFS/object store on a " +
              "real cluster) before the first iterative barrier")
        df.checkpoint()
      case other => badMode(other)
    }

  /** [[iter]] with DEFERRED materialization (r16): the barrier frame is
    * marked for checkpointing but materializes on the caller's NEXT
    * action instead of paying a dedicated job here. For loops whose
    * per-round state is immediately consumed by an action that computes
    * every partition (the incremental BPE trainer's delta aggregation),
    * this fuses the barrier job into that action — one distributed job
    * per round instead of two under `local` (under `reliable` the
    * checkpoint-file write job still follows the first action, exactly
    * as it does for [[iter]] — deferring is never slower, it just
    * stops being a win). Lineage truncation and the row contract
    * are identical to [[iter]] once the first action has run; callers
    * MUST run such an action before releasing the PREVIOUS round's
    * frame (the lazy checkpoint still reads it) — the natural order in
    * every iterate-then-release loop. Not a [[iter]] replacement:
    * multi-consumer frames whose first consumers race, or loops with no
    * full-coverage action, keep the eager barrier.
    */
  def iterLazy(df: DataFrame): DataFrame =
    modeOf(df) match {
      case "local" => df.localCheckpoint(eager = false)
      case mode @ ("replicated" | "reliable") =>
        if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            s"Barrier.iterLazy: spark.graft.barrier.mode=$mode maps to " +
              "df.checkpoint(), which requires " +
              "SparkContext.setCheckpointDir (HDFS/object store on a " +
              "real cluster) before the first iterative barrier")
        df.checkpoint(eager = false)
      case other => badMode(other)
    }

  /** Release a frame [[iter]] materialized: `local` → unpersist the
    * checkpoint RDD; cluster modes → no-op (reliable checkpoint files
    * belong to the checkpoint dir's lifecycle, exactly as in
    * [[release]]'s `reliable` arm — an iterative loop deletes nothing
    * a restarted query might still need).
    */
  def releaseIter(df: DataFrame): Unit =
    modeOf(df) match {
      case "local" => org.apache.spark.sql.graft.CheckpointUtils.release(df)
      case "replicated" | "reliable" => ()
      case other => badMode(other)
    }

  /** Release a frame [[once]] materialized, under the SAME mode config
    * (multi-consumer barriers — for per-round loop state use
    * [[releaseIter]]):
    * `local` → unpersist the checkpoint RDD (CheckpointUtils.release —
    * refuses derived plans), `replicated` → unpersist, `reliable` →
    * no-op (checkpoint files belong to the checkpoint dir's lifecycle).
    * Callers that can't release (the barrier backs their RETURNED plan)
    * simply don't call this — the ContextCleaner path — same as before.
    */
  def release(df: DataFrame): Unit =
    df.sparkSession.conf.getOption("spark.graft.barrier.mode")
      .getOrElse("local") match {
      case "local" => org.apache.spark.sql.graft.CheckpointUtils.release(df)
      case "replicated" => df.unpersist(blocking = false); ()
      case "reliable" => ()
      case other => throw new IllegalArgumentException(
        s"spark.graft.barrier.mode: unknown mode '$other' " +
          "(expected local | replicated | reliable)")
    }

  /** Call-site sugar keeping the checkpoint chain shape:
    * `df.barrierOnce()` ≡ `Barrier.once(df)`.
    */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def barrierOnce(): DataFrame = Barrier.once(df)
  }

  // The ITERATIVE checkpoint loops (Dedup star contraction, BPE merge
  // rounds, PQ/IVF-PQ training state, the streaming novelty pin) route
  // through [[iter]]/[[releaseIter]] — per-round lineage truncation in
  // every mode, reliable files under the cluster modes.
  //
  // NOT routed through any barrier (each keeps a deliberate direct
  // localCheckpoint):
  //  - Compaction's overwrite-in-place barrier — after the target path
  //    is overwritten, ANY recompute (which replicated persist allows on
  //    double loss) would re-read the replaced files and corrupt rather
  //    than fail: truncated lineage is the correctness contract itself;
  //  - foreachBatch micro-batch internals — per-batch bounded frames
  //    whose failure the streaming engine retries wholesale (the
  //    novelty pin is the exception: it IS loop state across batches,
  //    so it adopts [[iter]]).
}
