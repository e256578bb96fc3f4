package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.testkit.SparkSpec

/** Training-shard export contract: files are size-bounded, the export
  * is deterministic, and the read-back manifest equals the in-flight
  * plan (what's on disk IS what was packed).
  */
class ExportSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def export(out: String, maxPerFile: Int = 10) = {
    Export.writeShards(Tables(spark, dir, "documents"),
      seqLen = 512L, seqsPerShard = 16L, maxRecordsPerFile = maxPerFile, out)
    spark.read.parquet(out)
  }

  test("no shard file exceeds maxRecordsPerFile; shards are dir-partitioned") {
    val out = java.nio.file.Files.createTempDirectory("export-spec").toString
    val back = export(s"$out/shards", maxPerFile = 10)
    val perFile = back.groupBy(input_file_name()).count().collect()
    assert(perFile.nonEmpty)
    perFile.foreach(r => assert(r.getLong(1) <= 10L,
      s"file ${r.getString(0)} has ${r.getLong(1)} rows"))
    // partitioned layout: every file path carries its shard key
    perFile.foreach(r => assert(r.getString(0).contains("shard_id="), r.getString(0)))
  }

  test("export is deterministic: two runs, identical manifests and rows") {
    val out = java.nio.file.Files.createTempDirectory("export-spec").toString
    val a = export(s"$out/a")
    val b = export(s"$out/b")
    val cols = a.columns.sorted.map(col)
    assert(a.select(cols: _*).except(b.select(cols: _*)).isEmpty)
    assert(b.select(cols: _*).except(a.select(cols: _*)).isEmpty)
    val ma = Export.manifestOf(a).collect().map(_.toString).sorted
    val mb = Export.manifestOf(b).collect().map(_.toString).sorted
    assert(ma.sameElements(mb))
  }

  test("read-back manifest == manifest of the in-flight packed frame") {
    val out = java.nio.file.Files.createTempDirectory("export-spec").toString
    val docs = Tables(spark, dir, "documents")
    val back = export(s"$out/shards")
    val inFlight = graft.text.Packing
      .packSequences(docs, "doc_id", "text", 512L)
      .withColumn("shard_id", expr("seq_id div 16"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val fromFiles = Export.manifestOf(back).collect().map(_.toString).sorted
    val fromPlan = Export.manifestOf(inFlight).collect().map(_.toString).sorted
    assert(fromFiles.sameElements(fromPlan))
    // and the export actually sharded (more than one manifest row)
    assert(fromFiles.length > 1)
  }

  test("every doc lands in the shard of its starting sequence") {
    val out = java.nio.file.Files.createTempDirectory("export-spec").toString
    val back = export(s"$out/shards")
    val bad = back.filter(
      col("shard_id").cast("long") =!= expr("(tok_offset div 512) div 16"))
    assert(bad.isEmpty)
  }
}
