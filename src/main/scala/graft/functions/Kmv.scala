package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values (KMV) distinct-value sketch — the fourth sketch
  * family next to HLL distinct counts, Misra–Gries heavy hitters and
  * approximate quantiles, and the one that supports SET OPERATIONS:
  * because the sketch IS a uniform bottom-k sample of the distinct hash
  * values, two sketches can be intersected to estimate overlap/Jaccard
  * between 100 TB corpora without ever joining their contents
  * (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * The sketch is the k smallest DISTINCT hash values, kept sorted
  * ascending. That makes it, unlike engine-native theta/HLL sketches,
  * completely deterministic and order-independent — merge is
  * "union, keep k smallest", associative and commutative — so the whole
  * estimator replays formula-for-formula in ANSI SQL
  * (`row_number() OVER (ORDER BY h) <= k`) and the correctness gate can
  * hash-match it cross-engine, registers-and-all, like
  * [[graft.functions.Hll]].
  *
  * Estimators (h uniform on [0, M)): with the sketch full,
  * `ndv ≈ (k-1) * M / h_k` (the unbiased bottom-k estimator); with
  * fewer than k distinct values the sketch IS the distinct set and the
  * count is exact. For two sets, the k smallest of the UNION of the two
  * sketches is exactly the union's KMV sketch, and the fraction of its
  * members present in both inputs estimates the Jaccard similarity
  * (Beyer et al. §4: a bottom-k sample of the union is a uniform
  * sample, so the match fraction is a hypergeometric estimate of
  * |A∩B|/|A∪B|).
  *
  * O(k) mergeable state per group means partial aggregation works
  * map-side like any agg: at 100 TB the shuffle carries one ≤k-long
  * array per (group, partition) instead of every distinct value — and
  * persisted per-shard sketches compose later rollups from blobs
  * (see SketchQ.kmvNdvCompose), never rows.
  */
object Kmv {

  /** Hash domain: the base-31 rolling hash is uniform on [0, Mod). */
  final val Mod = 1000000007L

  final case class Buf(vs: Array[Long])

  /** Bottom-k distinct aggregate over a long column. The buffer is a
    * sorted ascending array of ≤ k distinct values; the steady-state
    * per-row cost is one binary search (most rows lose to the current
    * k-th minimum and are rejected O(log k)).
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Buf, Array[Long]] {
    require(k > 0)

    override def zero: Buf = Buf(Array.emptyLongArray)

    override def reduce(b: Buf, v: Long): Buf = {
      val vs = b.vs
      val n = vs.length
      if (n == k && v >= vs(n - 1)) return b // common case: not a new minimum
      val i = java.util.Arrays.binarySearch(vs, v)
      if (i >= 0) return b // already present: distinct semantics
      val at = -i - 1
      val m = if (n == k) k else n + 1
      val out = new Array[Long](m)
      System.arraycopy(vs, 0, out, 0, at)
      out(at) = v
      // when full, the old last element falls off the end
      System.arraycopy(vs, at, out, at + 1, m - at - 1)
      Buf(out)
    }

    /** Merge = union of two sorted distinct arrays, keep the k smallest
      * (one linear pass) — associative, commutative, and exactly the
      * sketch of the union of the underlying sets.
      */
    override def merge(a: Buf, b: Buf): Buf = {
      val x = a.vs; val y = b.vs
      if (x.isEmpty) return b
      if (y.isEmpty) return a
      val out = new Array[Long](math.min(k, x.length + y.length))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < x.length || j < y.length)) {
        val v =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) {
            val v0 = x(i); i += 1
            if (j < y.length && y(j) == v0) j += 1 // shared value: one slot
            v0
          } else { val v0 = y(j); j += 1; v0 }
        out(n) = v; n += 1
      }
      Buf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }

    override def finish(b: Buf): Array[Long] = b.vs

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column aggregate: sorted ascending bottom-k distinct sketch of a
    * long column (nulls upstream are the caller's problem — hash
    * columns here are non-null by construction).
    */
  def sketchOf(c: Column, k: Int): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(c)

  /** The ONE bottom-k estimator formula, (k−1)·M / h_k, derived from
    * `k` and [[Mod]] at the call site instead of re-hardcoding the two
    * constants wherever an estimate is read off a sketch (changing k
    * must change every estimate in lockstep). `kth` is the k-th minimum
    * as a column (`element_at(sk, k)` or a pre-aggregated max).
    */
  def estimateFromKth(kth: Column, k: Int): Column =
    org.apache.spark.sql.functions.lit((k - 1).toDouble) *
      org.apache.spark.sql.functions.lit(Mod.toDouble) / kth.cast("double")

  /** [[estimateFromKth]] with the under-full guard: a sketch holding
    * fewer than k values IS the exact distinct set, so its size is the
    * (exact) estimate.
    */
  def estimate(sk: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, size, when}
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(estimateFromKth(element_at(sk, k), k))
  }
}
