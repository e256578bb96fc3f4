package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native matrix–vector product: y_j = Σ_k rows(j)(k)·x_k over an
  * `array<double>` column, the rotation applied by
  * [[graft.ann.Opq.rotate]] to the whole corpus in every OPQ/OPQ_NP
  * index build (and to the query batch at serve time).
  *
  * The composed form — one `aggregate(zip_with(x, rowLit, _*_), 0d,
  * _+_)` per output dimension — allocates an intermediate array and
  * pays an interpreted lambda dispatch per (row, output dim, input
  * dim): d² dispatches and d allocations per corpus row, the whole
  * cost of the rotate pass. Here: one monomorphic double loop, the
  * matrix shipped once as a reference object.
  *
  * Parity is exact: each output coordinate accumulates in input-index
  * order from 0.0, identical to the fold over zip_with (multiply, then
  * ordered adds), so rotated corpora — and everything trained and
  * encoded from them — are bit-identical (MatVecProductSpec pins the
  * differential; the OPQ fixture oracle pins the serve path
  * end-to-end).
  *
  * Degenerate inputs: a vector whose length differs from the matrix
  * row length makes every output COORDINATE null in the composed form
  * (zip_with pads with null, null poisons the fold — an all-null array
  * of length d); here the whole output ROW is null instead. The two
  * are NOT interchangeable everywhere — `size(all-null array)` = d
  * while `size(null)` is null, so [[graft.ann.Pq.subDimChecked]] takes
  * its explicit null-vector raise branch on this form where the
  * composed form would have mis-sliced an all-null array — which is
  * the intended outcome: the repo contract is that mixed-dim/null
  * embeddings fail loudly, and the null row fails louder and earlier.
  * A null element likewise nulls every output coordinate → null row.
  * A null vector row is null.
  */
case class MatVecProduct(child: Expression,
    rows: Seq[Seq[Double]]) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (rows.isEmpty)
      return TypeCheckResult.TypeCheckFailure("graft_matvec: empty matrix")
    if (rows.exists(_.size != rows.head.size))
      return TypeCheckResult.TypeCheckFailure("graft_matvec: ragged matrix")
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_matvec requires an array<double> vector, got $t")
    }
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  @transient private lazy val packed: MatVecProduct.Packed = {
    val n = rows.size
    val dim = rows.head.size
    val flat = new Array[Double](n * dim)
    var j = 0
    while (j < n) {
      var i = 0
      while (i < dim) { flat(j * dim + i) = rows(j)(i); i += 1 }
      j += 1
    }
    MatVecProduct.Packed(flat, n, dim)
  }

  override protected def nullSafeEval(vec: Any): Any =
    MatVecProduct.apply0(vec.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val packedRef = ctx.addReferenceObj("matvecPacked", packed,
      classOf[MatVecProduct.Packed].getName)
    nullSafeCodeGen(ctx, ev, vec => {
      val r = ctx.freshName("matvecResult")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MatVecProduct.apply0($vec, $packedRef);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProduct =
    copy(child = newChild)
}

object MatVecProduct {

  /** Driver-packed matrix shipped as one reference object. */
  case class Packed(flat: Array[Double], n: Int, dim: Int)
    extends Serializable

  def apply0(vec: ArrayData, p: Packed): ArrayData = {
    // fold parity: length mismatch or any null element nulls every
    // output coordinate → null result row
    if (vec.numElements() != p.dim) return null
    var i = 0
    while (i < p.dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](p.n)
    var j = 0
    while (j < p.n) {
      var acc = 0.0
      val base = j * p.dim
      var k = 0
      while (k < p.dim) {
        acc += vec.getDouble(k) * p.flat(base + k)
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** DataFrame-API entry point. */
  def ofColumn(vec: Column, rows: Seq[Seq[Double]]): Column =
    ColumnBridge.column(MatVecProduct(ColumnBridge.expression(vec), rows))
}
