package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns. The public-API
  * alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — allocates an
  * intermediate array and evaluates interpreted lambdas per element; on
  * the all-pairs cosine queries that fold dominates runtime. This
  * expression is one tight loop inside whole-stage codegen.
  *
  * Accumulation is index-order, exactly like the fold, so results are
  * bit-identical to the reference implementation (and to the DuckDB
  * oracle's list arithmetic) — verified differentially in
  * ArrayDotProductSpec.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, false) ||
      left.dataType == ArrayType(DoubleType, true)) {
      if (right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<double> arguments, got ${right.dataType}")
    } else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> arguments, got ${left.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayDotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {

  /** Index-order multiply-accumulate; truncates to the shorter array
    * (mirrors `zip_with` which pads with null — the fold then skips
    * nothing because embedding arrays are equal-length; unequal lengths
    * are a caller bug either way).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** DataFrame-API entry point. */
  def ofColumns(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
