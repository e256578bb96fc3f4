package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native argmax-dot cell assignment: the index of the centroid with
  * the largest dot product against an `array<double>` vector — the ONE
  * assignment definition every IVF path shares
  * ([[graft.ann.Ann.ivfAssignments]], Lloyd training, the streamed
  * vector sink), previously an aggregate-over-cells HOF fold.
  *
  * With the corpus-adaptive nlist = ⌈√N⌉ the fold paid an interpreted
  * lambda dispatch and a struct allocation per (row, cell) over the
  * full-corpus assignment pass — at sf10 that is ~450 dispatches per
  * row, THE build-side term of the IVF family. Here: one monomorphic
  * double loop in codegen, centroids shipped once as a reference
  * object, never as plan literals.
  *
  * Parity with the fold is exact: dots accumulate in index order
  * (ArrayDotProduct semantics), the argmax keeps the EARLIER cell on
  * ties (strict `>` from a NegativeInfinity start), NaN dots lose every
  * comparison, and a cell whose dot is null (length mismatch or a null
  * element) is skipped exactly as null-poisoned comparisons skipped it
  * — a row with no comparable cell yields −1, like the fold's initial
  * accumulator. A null vector row ALSO yields −1 — exact fold parity
  * (the fold's initial accumulator survives when every dot is null) —
  * so a null-embedding row lands in the sentinel −1 cell of every
  * cluster join/group-by instead of silently vanishing
  * (ArgmaxDotIndexSpec pins this; no current producer emits null
  * vectors, but the sentinel keeps misuse visible).
  */
case class ArgmaxDotIndex(child: Expression,
    centroids: Seq[Seq[Double]]) extends UnaryExpression {

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (centroids.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "graft_argmax_dot: empty centroid matrix")
    if (centroids.exists(_.size != centroids.head.size))
      return TypeCheckResult.TypeCheckFailure(
        "graft_argmax_dot: ragged centroid matrix")
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_argmax_dot requires an array<double> vector, got $t")
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmax_dot"

  @transient private lazy val packed: ArgmaxDotIndex.Packed = {
    val n = centroids.size
    val dim = centroids.head.size
    val flat = new Array[Double](n * dim)
    var c = 0
    while (c < n) {
      var j = 0
      while (j < dim) { flat(c * dim + j) = centroids(c)(j); j += 1 }
      c += 1
    }
    ArgmaxDotIndex.Packed(flat, n, dim)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else ArgmaxDotIndex.assign(v.asInstanceOf[ArrayData], packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val packedRef = ctx.addReferenceObj("centroidsPacked", packed,
      classOf[ArgmaxDotIndex.Packed].getName)
    ev.copy(code = code"""
      ${childGen.code}
      int ${ev.value} = ${childGen.isNull} ? -1 :
        graft.functions.ArgmaxDotIndex.assign(${childGen.value}, $packedRef);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxDotIndex =
    copy(child = newChild)
}

object ArgmaxDotIndex {

  /** Driver-packed centroid matrix shipped as one reference object. */
  case class Packed(flat: Array[Double], n: Int, dim: Int)
    extends Serializable

  def assign(vec: ArrayData, p: Packed): Int = {
    // a length-mismatched vector nulls every dot in the fold form —
    // every cell skips, result −1 (kept: the composed semantics)
    if (vec.numElements() != p.dim) return -1
    // null-element scan once up front: a null anywhere nulls EVERY
    // cell's dot in the fold form, so the result is −1 regardless
    var j = 0
    while (j < p.dim) {
      if (vec.isNullAt(j)) return -1
      j += 1
    }
    var best = Double.NegativeInfinity
    var bc = -1
    var c = 0
    while (c < p.n) {
      var acc = 0.0
      val base = c * p.dim
      var i = 0
      while (i < p.dim) {
        acc += vec.getDouble(i) * p.flat(base + i)
        i += 1
      }
      if (acc > best) { best = acc; bc = c }
      c += 1
    }
    bc
  }

  /** DataFrame-API entry point over an `array<double>` column. */
  def ofColumn(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(ArgmaxDotIndex(ColumnBridge.expression(vec), centroids))
}
