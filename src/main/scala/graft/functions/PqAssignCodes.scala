package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ code assignment: for an `array<double>` vector and a
  * driver-held codebook matrix, emit the m argmin codes
  * (codes[s] = argmin_c ‖v_s − cb_s_c‖², computed as
  * cn2[s][c] − 2·v_s·cb_s_c like every PQ path here — the ‖v_s‖² term
  * is constant across codes).
  *
  * The composed form ([[graft.ann.Pq.encodeCodesWith]] before r16) was
  * m slice + transform-let + aggregate-over-k-codes HOF islands per
  * row — every per-code step an interpreted lambda dispatch with a
  * struct allocation, ~m·k of them per row across the whole encode
  * pass, which IS the dominant term of every PQ-family index build
  * (PQ/OPQ/OPQ_NP/IVF-PQ all encode the full corpus once per version).
  * This expression is one monomorphic triple loop inside codegen, and
  * keeps the probe-side kernel small (the [[AdcLookupSum]] rationale).
  *
  * Arithmetic parity with the composed form is exact on every
  * well-formed input: the per-code distance is the same
  * `norms[c] − 2.0·dot` with the dot accumulated in index order, the
  * argmin keeps the EARLIER code on ties (strict `<`, same as the
  * fold's `when(d < best)`), and NaN distances lose every comparison
  * (Java `<` ≡ Catalyst `<` on NaN here since best starts at
  * Double.MaxValue). PqSpec's fixture members hash-match through this
  * path; AdcLookupSumSpec's sibling differential pins the probe side.
  *
  * Degenerate inputs: dim not divisible by m, or a subvector length
  * differing from the codebook's, RAISES a descriptive error (the
  * composed form raised for non-divisible dims via
  * [[graft.ann.Pq.subDimChecked]]; for a codebook/corpus dim mismatch
  * it silently emitted −1 codes through null-poisoned dots — this
  * expression upgrades that to a loud failure, the scaladoc "mixed
  * dims fail loudly" contract). A null element inside a subvector
  * keeps the fold's outcome: that subspace's code is −1. A null vector
  * row yields a null codes array.
  */
case class PqAssignCodes(child: Expression,
    books: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (books.isEmpty || books.exists(_.isEmpty) ||
      books.exists(_.exists(_.isEmpty)))
      return TypeCheckResult.TypeCheckFailure(
        "graft_pq_assign: empty codebook")
    if (books.exists(_.size != books.head.size) ||
      books.exists(_.exists(_.size != books.head.head.size)))
      return TypeCheckResult.TypeCheckFailure(
        "graft_pq_assign: ragged codebook (subspaces must share k and " +
          "centroid dim)")
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_assign requires an array<double> vector, got $t")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_assign"

  /** Flat codebook + per-code squared norms, computed once per
    * expression instance with the same left-fold the composed form's
    * literals used (norms(s)(c) = Σ x², index order).
    */
  @transient private lazy val packed: PqAssignCodes.Packed =
    PqAssignCodes.pack(books)

  override protected def nullSafeEval(vec: Any): Any =
    PqAssignCodes.assign(vec.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val packedRef = ctx.addReferenceObj("pqPacked", packed,
      classOf[PqAssignCodes.Packed].getName)
    nullSafeCodeGen(ctx, ev, vec => {
      s"${ev.value} = graft.functions.PqAssignCodes.assign($vec, $packedRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignCodes =
    copy(child = newChild)
}

object PqAssignCodes {

  /** Driver-packed codebook shipped to executors as one reference
    * object (never a plan literal — a 16×32×4 codebook as nested
    * CreateArray nodes would bloat the plan and the generated kernel).
    */
  case class Packed(flat: Array[Double], norms: Array[Double],
      m: Int, k: Int, subDim: Int) extends Serializable

  /** Pack a codebook matrix into the flat executor form; shared by
    * the residual-PQ expressions ([[PqResidualAssignCodes]],
    * [[PqReconNorm]]) so one packing definition exists.
    */
  def pack(books: Seq[Seq[Seq[Double]]]): Packed = {
    val m = books.size
    val k = books.head.size
    val subDim = books.head.head.size
    val flat = new Array[Double](m * k * subDim)
    val norms = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val cent = books(s)(c)
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          val x = cent(j)
          flat((s * k + c) * subDim + j) = x
          acc += x * x
          j += 1
        }
        norms(s * k + c) = acc
        c += 1
      }
      s += 1
    }
    Packed(flat, norms, m, k, subDim)
  }

  def assign(vec: ArrayData, p: Packed): ArrayData = {
    val n = vec.numElements()
    if (n % p.m != 0)
      throw new SparkException(
        s"PQ: vector dim $n is not divisible by m=${p.m} — trailing " +
          "dimensions would be silently dropped from the codes")
    if (n / p.m != p.subDim)
      throw new SparkException(
        s"graft_pq_assign: vector subspace dim ${n / p.m} does not match " +
          s"the codebook's ${p.subDim} — mismatched corpus/codebook artifacts")
    val codes = new Array[Int](p.m)
    var s = 0
    while (s < p.m) {
      var best = Double.MaxValue
      var bc = -1
      var c = 0
      while (c < p.k) {
        var acc = 0.0
        var sawNull = false
        val base = (s * p.k + c) * p.subDim
        var j = 0
        while (j < p.subDim && !sawNull) {
          val idx = s * p.subDim + j
          if (vec.isNullAt(idx)) sawNull = true
          else {
            acc += vec.getDouble(idx) * p.flat(base + j)
            j += 1
          }
        }
        if (!sawNull) {
          val d = p.norms(s * p.k + c) - 2.0 * acc
          if (d < best) { best = d; bc = c }
        }
        c += 1
      }
      codes(s) = bc
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** DataFrame-API entry point over an `array<double>` column. */
  def ofColumn(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAssignCodes(ColumnBridge.expression(vec), books))
}
