package graft.ops

import java.io.File
import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Managed per-JVM stage-artifact directories.
  *
  * Curation and serving pipelines are STAGED at scale: an expensive
  * stage (cluster labels, an IVF index) writes a parquet artifact once
  * and downstream queries read it many times. Benchmarking those
  * downstream reads honestly requires (a) the write and the read to be
  * separately timeable, and (b) the artifact dirs to not leak — the two
  * defects VERDICT r4 flagged in the ad-hoc `createTempDirectory` calls
  * inside benched queries.
  *
  * All artifacts live under ONE temp root, removed by a JVM shutdown
  * hook; keys are (dataset dir, artifact name), so the same corpus
  * resolves to the same artifact within a session and different scale
  * factors never collide.
  *
  *  - [[ensure]]: build-once-per-JVM — later callers reuse (the
  *    compose-only / probe-only measurement path);
  *  - [[refresh]]: always rebuild into the managed dir (the stage-write
  *    measurement path), and mark it built so a later [[ensure]] reuses.
  */
object StageArtifacts {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft-stage")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  private val built = new ConcurrentHashMap[String, String]()

  /** Short path-derived identifier: the first 64 bits of MD5(path) as
    * hex. Content digest, not String.hashCode — a collision would
    * silently serve one path's artifact (an IVF index, a catalog root)
    * for another; 64 truncated bits put the birthday bound near 2^32
    * distinct paths, versus String.hashCode collisions that occur in
    * the wild. The ONE definition [[graft.queries.CatalogQ]] and the
    * artifact keys share.
    */
  def pathIdent(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)

  private def keyFor(dataDir: String, name: String): String =
    name + "-" + pathIdent(new File(dataDir).getAbsolutePath)

  /** The artifact dir for (dataDir, name), building it with `build` on
    * the FIRST touch in this JVM and reusing it afterwards.
    *
    * RE-ENTRANT by design: a builder may itself call [[ensure]] for the
    * artifacts it composes from (the publish store builds the card,
    * which reads the per-modality cluster artifacts). The first cut ran
    * `build` inside `ConcurrentHashMap.computeIfAbsent`, where a nested
    * ensure whose key lands in the SAME hash bin throws
    * `IllegalStateException: Recursive update` — a landmine that only
    * fires for specific (path, name) hash collisions (it did, once, at
    * one scale factor and not another). Now the build runs OUTSIDE the
    * map under a per-key monitor: nested ensure calls are legal (the
    * dependency graph is a DAG, so consistent outer-before-inner lock
    * acquisition cannot cycle), and double-build is still impossible.
    */
  def ensure(dataDir: String, name: String)(build: String => Unit): String = {
    val k = keyFor(dataDir, name)
    val existing = built.get(k)
    if (existing != null) return existing
    // SAME-key re-entry (a builder ensuring its own key) would recurse
    // forever through the re-entrant monitor below — the old
    // computeIfAbsent at least threw `Recursive update`; keep that
    // failure DESCRIPTIVE rather than a StackOverflowError
    if (inProgress.get().contains(k))
      throw new IllegalStateException(
        s"StageArtifacts.ensure: builder for '$name' (key $k) called " +
          "ensure() for its OWN key — a self-dependent artifact is a " +
          "builder bug, not a DAG")
    val lock = locks.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      val again = built.get(k)
      if (again != null) return again
      val dir = root.resolve(k).toString
      inProgress.get().add(k)
      try build(dir)
      finally inProgress.get().remove(k)
      built.put(k, dir)
      dir
    }
  }

  private val locks = new ConcurrentHashMap[String, Object]()
  // per-thread: nested ensure from OTHER threads is the normal
  // cross-artifact DAG case and must not trip the self-dependency guard
  private val inProgress =
    ThreadLocal.withInitial[java.util.HashSet[String]](() =>
      new java.util.HashSet[String]())

  /** Rebuild the artifact unconditionally (parquet overwrite semantics
    * are the builder's responsibility) and mark it built.
    */
  def refresh(dataDir: String, name: String)(build: String => Unit): String = {
    val k = keyFor(dataDir, name)
    val dir = root.resolve(k).toString
    build(dir)
    built.put(k, dir)
    dir
  }

  /** Recursively delete whatever a previous run left under `dir` — for
    * [[refresh]] builders whose write path APPENDS or MERGES (streaming
    * sinks) rather than overwrites: without the wipe, a re-run would
    * verify an idempotent re-merge instead of the build path.
    */
  def wipeDir(dir: String): Unit = deleteRec(new File(dir))

  private def deleteRec(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(): Unit
  }
}
