package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** From-scratch HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007)
  * with a CROSS-ENGINE-DETERMINISTIC contract: every register value and
  * the final estimate are replayable in plain SQL, so the sketch is
  * hash-match oracled — unlike engine-native HLL implementations
  * (Spark's DataSketches `hll_sketch_agg`, `SketchQ.approxDistinct`)
  * whose estimates are private to the engine and can only be
  * bound-checked.
  *
  * Layout: m = 1024 registers (b = 10), standard error 1.04/√m ≈ 3.3%.
  * Per value v (hashed as a string):
  *   - bucket  = h1(v) mod 1024           (h1 = [[RollingHash]], base 31 mod 1e9+7)
  *   - w       = (h2(v) · 2^30) div Mod2  (h2 = [[RollingHash2]], base 131 mod 998244353)
  *   - rank    = 31 − bitLength(w), or 31 when w = 0
  * The `w` rescale maps the mod-998244353 hash onto the full 30-bit
  * domain so the geometric rank distribution is unbiased (raw
  * mod-prime values cover only 93% of [0, 2^30) and would skew the
  * estimator up by ~7.5%); the rescale is one exact integer
  * multiply-divide in both engines. Registers hold max(rank) ∈ [0, 31]
  * — one byte each, 1 KB total state.
  *
  * Estimator, mirrored operation-for-operation by the DuckDB oracle:
  *   Z     = Σ_j 2^(−M_j)   (every term a power of two spanning < 53
  *           bits of precision, so the double sum is EXACT and
  *           order-independent — no summation-order hazard)
  *   E     = α_m · m² / Z,  α_m = 0.7213 / (1 + 1.079/m)
  *   E*    = m · ln(m/V) when E ≤ 2.5m and V = zero registers > 0
  *           (linear counting; ln under the repo's round-at-fixed-dp
  *           cross-engine contract, T14 precedent)
  * The 2^32-range collision correction is omitted by contract: ranks
  * live in a 30-bit domain and this sketch profiles corpora with NDV
  * ≪ 2^30 per group; at larger cardinalities raise b, don't patch the
  * tail.
  *
  * Scale story: the classic one — exact `count(DISTINCT …)` shuffles
  * every distinct value; the sketch is a 1 KB mergeable state combined
  * map-side, so the shuffle carries O(groups) KB regardless of data
  * size. Mergeability (register-wise max) also makes partial sketches
  * PERSISTABLE artifacts: sketch each day's partition once, answer any
  * later rollup by merging 1 KB blobs — see [[Hll.merge]] and the
  * HllSpec incremental test.
  */
object Hll {

  /** Register-count exponent: m = 2^B registers. */
  final val B = 10
  final val M = 1 << B

  /** Packed (bucket, rank) input: bucket · 32 + rank, rank ∈ [0, 31]. */
  final val RankBits = 5

  final case class Result(reg_sum: Long, reg_checksum: Long,
      zero_regs: Long, est: Double)

  /** rank of the rescaled 30-bit word derived from an h2 hash. */
  def rank(h2: Long): Int = {
    val w = (h2 << 30) / RollingHash2.Mod
    if (w == 0L) 31 else 31 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  def pack(h1: Long, h2: Long): Long = ((h1 % M) << RankBits) | rank(h2)

  /** Estimator over a register array (shared by the aggregator finish
    * and any persisted-sketch consumer). reg_checksum = Σ (j+1)·M_j is
    * the positional integer checksum that gives the oracle exact teeth
    * on every register value; the float estimate alone would accept a
    * permuted or off-by-one register file.
    */
  def result(regs: Array[Byte]): Result = {
    var j = 0
    var sum = 0L
    var chk = 0L
    var zero = 0L
    var z = 0.0
    while (j < M) {
      val m = regs(j).toInt
      sum += m
      chk += (j + 1).toLong * m
      if (m == 0) zero += 1
      z += java.lang.Math.pow(2.0, -m)
      j += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val eRaw = alpha * M * M / z
    val est =
      if (eRaw <= 2.5 * M && zero > 0) M * math.log(M.toDouble / zero)
      else eRaw
    Result(sum, chk, zero, est)
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M,
      s"hll merge requires two $M-register sketches")
    val out = new Array[Byte](M)
    var j = 0
    while (j < M) {
      out(j) = if (a(j) >= b(j)) a(j) else b(j)
      j += 1
    }
    out
  }

  private abstract class BaseAgg[O] extends Aggregator[Long, Array[Byte], O] {
    override def zero: Array[Byte] = new Array[Byte](M)
    override def reduce(regs: Array[Byte], packed: Long): Array[Byte] = {
      val bucket = (packed >>> RankBits).toInt
      val r = (packed & ((1L << RankBits) - 1)).toByte
      if (r > regs(bucket)) regs(bucket) = r
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      Hll.merge(a, b)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class SketchAgg extends BaseAgg[Array[Byte]] {
    override def finish(regs: Array[Byte]): Array[Byte] = regs
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class EstimateAgg extends BaseAgg[Result] {
    override def finish(regs: Array[Byte]): Result = Hll.result(regs)
    override def outputEncoder: Encoder[Result] = ExpressionEncoder[Result]()
  }

  private abstract class BaseMergeAgg[O]
      extends Aggregator[Array[Byte], Array[Byte], O] {
    override def zero: Array[Byte] = new Array[Byte](M)
    override def reduce(acc: Array[Byte], regs: Array[Byte]): Array[Byte] =
      if (regs == null) acc
      else {
        require(regs.length == M, s"hll merge requires $M-register sketches")
        var j = 0
        while (j < M) {
          if (regs(j) > acc(j)) acc(j) = regs(j)
          j += 1
        }
        acc
      }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      Hll.merge(a, b)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class MergeEstimateAgg extends BaseMergeAgg[Result] {
    override def finish(regs: Array[Byte]): Result = Hll.result(regs)
    override def outputEncoder: Encoder[Result] = ExpressionEncoder[Result]()
  }

  private final class MergeSketchAgg extends BaseMergeAgg[Array[Byte]] {
    override def finish(regs: Array[Byte]): Array[Byte] = regs
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a packed (bucket, rank) column to the raw 1 KB register
    * file — the persistable/mergeable artifact form.
    */
  def sketchOf(packed: Column): Column =
    udaf(new SketchAgg, Encoders.scalaLong).apply(packed)

  /** Aggregate a column of PERSISTED register files (binary sketches)
    * to the estimate struct — the rollup-from-artifact form: later
    * aggregations merge 1 KB blobs, never re-touching rows.
    */
  def mergeEstimateOf(sketch: Column): Column =
    udaf(new MergeEstimateAgg, Encoders.BINARY).apply(sketch)

  /** Aggregate a column of PERSISTED register files to one MERGED
    * register file (register-wise max, still the artifact form) — the
    * incremental-ingest primitive: fold a batch's partial sketches into
    * a persisted sketch table without leaving blob space. Register max
    * is idempotent, so re-merging a redelivered batch is a no-op.
    */
  def mergeSketchOf(sketch: Column): Column =
    udaf(new MergeSketchAgg, Encoders.BINARY).apply(sketch)

  /** Aggregate a packed column straight to the estimate struct
    * (reg_sum, reg_checksum, zero_regs, est).
    */
  def estimateOf(packed: Column): Column =
    udaf(new EstimateAgg, Encoders.scalaLong).apply(packed)
}
