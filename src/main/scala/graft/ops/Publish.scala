package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Transactional MULTI-artifact publishing — the snapshot-pointer
  * pattern (one atomically-swapped manifest names the current version
  * directory; the same public recipe table formats like Iceberg build
  * on, reduced to what a parquet artifact store needs).
  *
  * [[graft.etl.Upsert.replaceParquet]] makes ONE directory's swap
  * crash-safe. A curation pipeline publishes SETS: the cluster-label
  * artifact, the MinHash band index and the composed verdict belong to
  * the same corpus version, and a reader that joins cluster labels at
  * version N with an index at version N+1 silently produces
  * mixed-version results — the exact class of bug the per-dir swap
  * cannot rule out, because each dir commits independently.
  *
  * Contract here: readers resolve every artifact path through the
  * manifest, and the manifest is ONE file renamed into place — so a
  * crash at ANY point of a publish leaves readers on the previous
  * complete version, and version N+1 becomes visible for all artifacts
  * at the same instant or not at all. Writes go to a fresh `v<N+1>/`
  * directory, never in place, so running queries that already resolved
  * version N keep reading consistent files (parquet dirs are immutable
  * once published). The two most recent versions are retained (the
  * in-flight-reader grace window at 100 TB — readers outlive a publish);
  * older versions and aborted partial writes are garbage-collected on
  * the next successful publish.
  *
  * Rename atomicity: the manifest swap uses a delete+rename pair on the
  * SAME directory; on HDFS/posix rename is atomic, and the recovery
  * path mirrors replaceParquet's (a crash between delete and rename is
  * healed by re-resolving the highest complete version marker).
  */
object Publish {

  private val ManifestName = "MANIFEST"

  /** Publish one consistent version of `artifacts`: each writer
    * receives its fresh output path under `root/v<N+1>/<name>`; after
    * ALL writers succeed (and only then), the manifest is swapped to
    * the new version. Any writer failure aborts the publish with the
    * manifest untouched — the partial `v<N+1>` directory is inert and
    * swept by the next successful publish. Returns the published
    * version number.
    *
    * SINGLE-WRITER contract: one publisher per root at a time (the
    * pipeline scheduler's job — plain delete+rename cannot arbitrate
    * two writers the way a CAS primitive could). Two concurrent
    * publishers can compute the same `v<N+1>`, clear each other's
    * in-flight directory, and race the manifest swap; readers stay
    * safe (they only ever resolve a complete manifest) but one publish
    * is silently lost. Serialize publishes externally.
    */
  def publish(spark: SparkSession, root: String,
      artifacts: Map[String, String => Unit]): Long = {
    require(artifacts.nonEmpty, "publish of zero artifacts")
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, root)
    // version numbers are NEVER reused: next = highest version ever
    // seen on disk + 1, not pointer + 1 — after a rollback, the
    // rolled-past version's directory may still be held by a reader
    // that resolved it pre-rollback, and republishing over it would
    // change content under that reader's feet
    val maxSeen =
      if (!fs.exists(new Path(root))) 0L
      else fs.listStatus(new Path(root)).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
        .maxOption.getOrElse(0L)
    val next = math.max(cur.getOrElse(0L), maxSeen) + 1L
    val vdir = new Path(root, s"v$next")
    // a leftover v<next> (an aborted publish — never pointed at by the
    // manifest) is dead; clear it rather than letting old artifacts
    // bleed into the new version
    if (fs.exists(vdir)) fs.delete(vdir, true)
    // deterministic name order, so a crash mid-publish has a stable
    // "how far did it get" shape for debugging
    artifacts.toSeq.sortBy(_._1).foreach { case (name, write) =>
      write(new Path(vdir, name).toString)
    }
    writeManifest(fs, root,
      Manifest(next, artifacts.keys.toSeq.sorted))
    // retention: the new version, the version the pointer just left,
    // AND the highest pre-existing version (distinct from `cur` only
    // right after a rollback — a pre-rollback reader may still hold
    // it). The next normal publish ages the extras out.
    gc(fs, root, keep =
      (Set(cur, Some(next)).flatten ++
        (if (maxSeen > 0) Set(maxSeen) else Set.empty[Long]))
        .map(v => s"v$v"))
    next
  }

  /** The artifact paths of the CURRENT complete version — every path
    * from one manifest read, so the set is mutually consistent no
    * matter how many publishes race past the reader afterwards.
    */
  def current(spark: SparkSession, root: String): Map[String, String] =
    readManifest(fsOf(spark, root), root) match {
      case None => Map.empty
      case Some(m) =>
        m.names.map(n => n -> new Path(root, s"v${m.version}/$n").toString)
          .toMap
    }

  /** The current version number, if anything has been published. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    readManifest(fsOf(spark, root), root).map(_.version)

  /** Roll the pointer back one version (the "yesterday's corpus verdict
    * was wrong" lever): re-points the manifest at version N−1, which is
    * retained by the GC grace window. Fails if no previous version
    * still exists on disk.
    */
  def rollback(spark: SparkSession, root: String): Long = {
    val fs = fsOf(spark, root)
    val m = readManifest(fs, root).getOrElse(
      throw new IllegalStateException(s"rollback: nothing published at $root"))
    val prev = m.version - 1
    val pdir = new Path(root, s"v$prev")
    if (prev < 1 || !fs.exists(pdir))
      throw new IllegalStateException(
        s"rollback: version $prev is gone (GC keeps two); root=$root")
    val names = fs.listStatus(pdir).map(_.getPath.getName).toSeq.sorted
    writeManifest(fs, root, Manifest(prev, names))
    prev
  }

  private final case class Manifest(version: Long, names: Seq[String])

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One line: `<version>\t<name,name,...>` — trivially parseable, no
    * JSON dependency in the storage layer.
    */
  private def writeManifest(fs: FileSystem, root: String, m: Manifest): Unit = {
    val target = new Path(root, ManifestName)
    val tmp = new Path(root, ManifestName + "__tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"${m.version}\t${m.names.mkString(",")}\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(target) && !fs.delete(target, false))
      throw new RuntimeException(s"manifest swap: cannot delete $target")
    if (!fs.rename(tmp, target))
      throw new RuntimeException(s"manifest swap failed: $tmp -> $target")
  }

  private def readManifest(fs: FileSystem, root: String): Option[Manifest] = {
    val target = new Path(root, ManifestName)
    val tmp = new Path(root, ManifestName + "__tmp")
    // crash healing: died between delete(target) and rename(tmp) — the
    // fully-written tmp IS the newest manifest; complete the rename
    if (!fs.exists(target) && fs.exists(tmp) && !fs.rename(tmp, target))
      throw new RuntimeException(s"manifest recovery failed at $root")
    if (!fs.exists(target)) return None
    val in = fs.open(target)
    val line =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val Array(v, names) = line.split("\t", 2)
    Some(Manifest(v.toLong,
      if (names.isEmpty) Nil else names.split(",").toSeq))
  }

  /** Remove every `v*` directory not in `keep` (aborted partials and
    * versions older than the grace window) plus a stray
    * `MANIFEST__tmp` left by a publisher that crashed mid-swap (safe:
    * gc only runs right after a successful manifest write, so a
    * lingering tmp is by definition stale — the recovery path in
    * [[readManifest]] only ever promotes a tmp when the target is
    * missing, and it isn't).
    */
  private def gc(fs: FileSystem, root: String, keep: Set[String]): Unit = {
    fs.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("v") && !keep.contains(n))
        fs.delete(st.getPath, true): Unit
    }
    val tmp = new Path(root, ManifestName + "__tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false): Unit
  }
}
