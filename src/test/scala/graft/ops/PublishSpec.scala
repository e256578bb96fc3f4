package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkSpec

/** The multi-artifact publish contract: a reader resolving through the
  * manifest NEVER observes a mixed-version artifact set, no matter
  * where a publish crashes; versions swap atomically; rollback works
  * within the GC grace window.
  */
class PublishSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("publish_spec").toString + "/store"

  private def writeNums(tag: String)(path: String): Unit =
    Seq((1L, tag), (2L, tag)).toDF("id", "tag")
      .write.mode("overwrite").parquet(path)

  private def tagsAt(root: String): Map[String, String] =
    Publish.current(spark, root).map { case (name, path) =>
      name -> spark.read.parquet(path).select("tag").distinct()
        .collect().map(_.getString(0)).mkString
    }

  test("publish is atomic across artifacts; versions advance") {
    val root = newRoot()
    assert(Publish.current(spark, root).isEmpty)
    val v1 = Publish.publish(spark, root, Map(
      "labels" -> writeNums("v1"), "index" -> writeNums("v1")))
    assert(v1 === 1L)
    assert(tagsAt(root) === Map("labels" -> "v1", "index" -> "v1"))
    val v2 = Publish.publish(spark, root, Map(
      "labels" -> writeNums("v2"), "index" -> writeNums("v2")))
    assert(v2 === 2L)
    assert(tagsAt(root) === Map("labels" -> "v2", "index" -> "v2"))
  }

  test("a writer crash aborts the publish with the old version intact") {
    val root = newRoot()
    Publish.publish(spark, root, Map(
      "labels" -> writeNums("v1"), "index" -> writeNums("v1")))
    // second artifact's writer dies AFTER the first wrote: readers must
    // stay on v1 for BOTH artifacts (the mixed-version read this
    // operator exists to prevent)
    intercept[RuntimeException] {
      Publish.publish(spark, root, Map(
        "a_labels" -> writeNums("v2"),
        "z_index" -> (_ => throw new RuntimeException("disk full"))))
    }
    assert(tagsAt(root) === Map("labels" -> "v1", "index" -> "v1"))
    // and the next successful publish is unaffected by the debris
    Publish.publish(spark, root, Map(
      "labels" -> writeNums("v3"), "index" -> writeNums("v3")))
    assert(tagsAt(root) === Map("labels" -> "v3", "index" -> "v3"))
  }

  test("the DATASET CARD rides the crash matrix: a failed card write " +
      "leaves readers on the old (labels, card) pair; the recovered " +
      "publish serves the inline card exactly") {
    val dir = "/root/testdata/sf0.001"
    val root = newRoot()
    def writeCard(path: String): Unit =
      graft.queries.CardQ.dataCard(spark, dir)
        .write.mode("overwrite").parquet(path)
    def writeLabels(tag: String)(path: String): Unit = writeNums(tag)(path)
    Publish.publish(spark, root, Map(
      "clusters" -> writeLabels("v1"), "card" -> writeCard))
    val v1Card = spark.read.parquet(Publish.current(spark, root)("card"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(v1Card.nonEmpty)
    // the card writer dies mid-publish (alphabetically after clusters,
    // so the labels for v2 are already on disk): readers must keep the
    // v1 card AND the v1 labels — a v2-labels/v1-card serve would be
    // exactly the mixed-version release this store exists to prevent
    intercept[RuntimeException] {
      Publish.publish(spark, root, Map(
        "clusters" -> writeLabels("v2"),
        "xcard" -> (_ => throw new RuntimeException("card stage died"))))
    }
    val after = Publish.current(spark, root)
    assert(after.keySet === Set("clusters", "card"))
    assert(spark.read.parquet(after("card"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet === v1Card)
    assert(spark.read.parquet(after("clusters")).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
    // recovery: the next publish versions both again, and the card
    // served through the pointer is EXACTLY the inline relation
    Publish.publish(spark, root, Map(
      "clusters" -> writeLabels("v3"), "card" -> writeCard))
    val served = spark.read.parquet(Publish.current(spark, root)("card"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(served === graft.queries.CardQ.dataCard(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet)
  }

  test("rollback re-points at the retained previous version") {
    val root = newRoot()
    Publish.publish(spark, root, Map("labels" -> writeNums("v1")))
    Publish.publish(spark, root, Map("labels" -> writeNums("v2")))
    assert(Publish.rollback(spark, root) === 1L)
    assert(tagsAt(root) === Map("labels" -> "v1"))
    // publishing after a rollback NEVER reuses the rolled-past version
    // number (a pre-rollback reader may still hold v2's paths): the new
    // publish lands at v3 and v2's directory survives until GC'd
    Publish.publish(spark, root, Map("verdict" -> writeNums("v2b")))
    assert(tagsAt(root) === Map("verdict" -> "v2b"))
    assert(Publish.currentVersion(spark, root) === Some(3L))
    assert(new java.io.File(root, "v2").isDirectory,
      "rolled-past version must survive the immediate republish")
  }

  test("GC keeps exactly the two most recent versions") {
    val root = newRoot()
    (1 to 4).foreach(i =>
      Publish.publish(spark, root, Map("labels" -> writeNums(s"v$i"))))
    val dirs = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs === Seq("v3", "v4"))
    // one rollback works, a second is refused (v2 is gone)
    assert(Publish.rollback(spark, root) === 3L)
    intercept[IllegalStateException](Publish.rollback(spark, root))
  }

  test("manifest crash window heals: completed tmp is recovered") {
    val root = newRoot()
    Publish.publish(spark, root, Map("labels" -> writeNums("v1")))
    // simulate a crash between delete(MANIFEST) and rename(tmp):
    // the fully-written tmp is the newest manifest
    val m = new java.io.File(root, "MANIFEST")
    val tmp = new java.io.File(root, "MANIFEST__tmp")
    java.nio.file.Files.copy(m.toPath, tmp.toPath)
    assert(m.delete())
    assert(tagsAt(root) === Map("labels" -> "v1")) // healed on read
    assert(new java.io.File(root, "MANIFEST").exists())
  }

  test("concurrent readers resolving before a publish keep a consistent set") {
    val root = newRoot()
    Publish.publish(spark, root, Map(
      "labels" -> writeNums("v1"), "index" -> writeNums("v1")))
    val resolved = Publish.current(spark, root) // reader snapshot
    Publish.publish(spark, root, Map(
      "labels" -> writeNums("v2"), "index" -> writeNums("v2")))
    // v1 files still exist (grace window): the old reader's paths all
    // resolve and all carry v1
    val tags = resolved.values.map(p =>
      spark.read.parquet(p).select("tag").distinct().as[String].head())
    assert(tags.toSet === Set("v1"))
  }
}
