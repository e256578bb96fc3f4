package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.ops.Barrier.Ops

/** Training-sequence packing: lay every document's tokens out on one
  * global concatenated tape (GPT-style concat-and-chunk packing) and
  * report, per document, its starting token offset and which
  * fixed-length training sequence that offset falls in. Documents are
  * ordered by (content rolling hash, id) — deterministic, reproducible,
  * and ingestion-order-unbiased, the same recipe as the stratified
  * sampler.
  *
  * The global exclusive prefix sum is computed the way a 1000-executor
  * job must: documents hash into `buckets` VALUE-RANGE buckets of the
  * order key (a pure function of the key, so bucket boundaries respect
  * the global order), per-bucket token totals — `buckets` longs — come
  * to the driver, and each bucket's base offset broadcasts back; the
  * per-row cumulative sum then runs as a window WITHIN each bucket.
  * No single-partition global window (the naive
  * `Window.orderBy(...)` collapses the whole corpus into one task);
  * driver state is O(buckets). Size `buckets` to ~2–4× the executor
  * slot count.
  */
object Packing {

  private val HashMod = 1000000007L // rollingHash's modulus

  /** (doc_id, n_tokens, okey, bucket) — the ONE keyed projection both
    * packers share: deterministic content-hash order key and its
    * value-range bucket (ceil-width, so bucket < buckets and bucket
    * boundaries respect the global okey order).
    */
  private def keyedByBucket(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val width = (HashMod + buckets - 1) / buckets
    df.select(
      col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
      TextOps.rollingHash(TextOps.normalize(col(textCol))).as("okey"))
      .withColumn("bucket", (col("okey") / lit(width)).cast("int"))
  }

  /** (doc_id, n_tokens, tok_offset, seq_id, offset_in_seq) per document:
    * `tok_offset` is the document's first token's position on the global
    * tape, `seq_id = tok_offset div seqLen`, `offset_in_seq` its offset
    * inside that sequence. A document may straddle a sequence boundary —
    * that is the concat-and-chunk contract (the consumer splits at
    * sequence edges).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Long, buckets: Int = 64): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val spark = df.sparkSession
    // checkpoint barrier: the tokenize+hash projection feeds BOTH the
    // phase-1 totals action and the phase-2 output plan — without it the
    // whole-corpus scan runs twice. The materialized frame is 4 narrow
    // columns per doc; it stays pinned until the result frame is dropped
    // and the ContextCleaner collects it.
    val keyed = keyedByBucket(df, idCol, textCol, buckets).barrierOnce()
    // phase 1: per-bucket totals -> driver (O(buckets) longs), exclusive
    // running base per bucket
    val totals = keyed.groupBy("bucket").agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val baseRows = (0 until buckets).map { b =>
      val base = acc
      acc += totals.getOrElse(b, 0L)
      Row(b, base)
    }
    val bases = spark.createDataFrame(
      spark.sparkContext.parallelize(baseRows, 1),
      StructType(Seq(StructField("bucket", IntegerType, nullable = false),
        StructField("base", LongType, nullable = false))))
    // phase 2: exclusive cumsum within each bucket + the bucket's base
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("okey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(bases, "bucket")
      .withColumn("tok_offset",
        col("base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        // integer div, not double division + truncate: tape offsets at
        // 100 TB exceed double's exact-integer range
        expr(s"tok_offset div $seqLen").as("seq_id"),
        pmod(col("tok_offset"), lit(seqLen)).as("offset_in_seq"))
  }

  /** Per-sequence DOCUMENT SPANS — the attention-mask manifest of the
    * concat-and-chunk tape: for every training sequence, which
    * documents occupy it and at which in-sequence token offsets
    * `[start_in_seq, end_in_seq)`. This is the sibling output
    * [[packSequences]]' consumer needs to zero attention across
    * document boundaries inside a packed sequence (block-diagonal
    * attention masking) — without it, packed training silently attends
    * across unrelated documents.
    *
    * A document spanning k sequence boundaries contributes k+1 rows
    * (its tape interval clipped to each sequence) — `sequence(first,
    * last)` is safe here because first ≤ last always (every doc has
    * ≥ 1 token). One Generate over the packed frame; the spans of a
    * sequence tile it exactly, which PackingSpec asserts corpus-wide.
    */
  def packSpans(df: DataFrame, idCol: String, textCol: String,
      seqLen: Long, buckets: Int = 64): DataFrame =
    packSequences(df, idCol, textCol, seqLen, buckets)
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"))
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_offset div $seqLen"),
        expr(s"(tok_offset + n_tokens - 1) div $seqLen"))))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("tok_offset") - col("seq_id") * seqLen, lit(0L))
          .as("start_in_seq"),
        least(col("tok_offset") + col("n_tokens") - col("seq_id") * seqLen,
          lit(seqLen)).as("end_in_seq"))

  /** NO-SPLIT sequence packing: every document lands whole in exactly
    * one fixed-capacity bin (next-fit: a doc that would overflow the
    * current bin closes it and opens the next) — the packing used when
    * training samples must respect document boundaries, where the
    * concat-and-chunk tape ([[packSequences]]) may straddle them.
    *
    * Next-fit is inherently SEQUENTIAL (each assignment depends on the
    * running fill), which does not distribute as one global scan. The
    * scalable shape: documents hash into `buckets` value-range buckets
    * of the deterministic (content-hash) order key, and next-fit runs
    * independently PER BUCKET — each bucket is a streaming O(1)-state
    * scan inside `mapPartitions`, buckets pack in parallel, and bins
    * are bucket-local (globally unique via `bin_id = bucket·2⁴⁰ +
    * bin_in_bucket`). Waste vs a single global scan is at most one
    * partially-filled trailing bin per bucket — bounded by `buckets`,
    * chosen ~2–4× the executor slot count, regardless of corpus size.
    *
    * A document larger than `capacity` occupies a bin alone (it can
    * never be split); every other bin's fill is ≤ `capacity`. The
    * assignment is a pure function of (content, id) — reproducible
    * across runs, partitionings and ingestion orders.
    */
  def packBinsNoSplit(df: DataFrame, idCol: String, textCol: String,
      capacity: Long, buckets: Int = 64): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val spark = df.sparkSession
    import spark.implicits._
    keyedByBucket(df, idCol, textCol, buckets)
      // co-locate each bucket, order it, then stream: one partition may
      // carry several buckets (hash partitioning), so the fold resets
      // its state at every bucket boundary
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("okey"), col("doc_id"))
      .as[(Long, Long, Long, Int)]
      .mapPartitions { it =>
        var curBucket = Int.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (id, n, _, b) =>
          if (b != curBucket) { curBucket = b; bin = 0L; fill = 0L }
          if (fill > 0 && fill + n > capacity) { bin += 1; fill = 0L }
          val off = fill
          fill += n
          PackedBin(id, n, b, bin, off)
        }
      }
      .toDF()
      .withColumn("bin_id",
        col("bucket").cast("long") * lit(1L << 40) + col("bin_in_bucket"))
  }
}

/** One document's no-split bin assignment ([[Packing.packBinsNoSplit]]). */
final case class PackedBin(doc_id: Long, n_tokens: Long, bucket: Int,
    bin_in_bucket: Long, offset_in_bin: Long)
