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

  /** Materialize `df` once, per the session's
    * `spark.graft.barrier.mode` (local | replicated | reliable).
    * Eager in every mode — consumers never race the materialization.
    */
  def once(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.barrier.mode")
      .getOrElse("local") match {
      case "local" => df.localCheckpoint()
      case "replicated" =>
        df.persist(StorageLevel.MEMORY_AND_DISK_2)
        df.count() // eager: match localCheckpoint's semantics
        df
      case "reliable" => df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"spark.graft.barrier.mode: unknown mode '$other' " +
          "(expected local | replicated | reliable)")
    }

  /** Release a frame [[once]] materialized, under the SAME mode config:
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

  // NOT routed through the barrier (each keeps a deliberate direct
  // localCheckpoint):
  //  - the ITERATIVE checkpoint loops (Dedup star contraction, BPE merge
  //    rounds, streaming novelty state) — those need lineage truncation
  //    per round to bound plan growth, so replicated persist (which
  //    keeps lineage) is the wrong cluster answer there; `reliable`
  //    checkpointing is, and they adopt it separately;
  //  - Compaction's overwrite-in-place barrier — after the target path
  //    is overwritten, ANY recompute (which replicated persist allows on
  //    double loss) would re-read the replaced files and corrupt rather
  //    than fail: truncated lineage is the correctness contract itself;
  //  - foreachBatch micro-batch internals — per-batch bounded frames
  //    whose failure the streaming engine retries wholesale.
}
