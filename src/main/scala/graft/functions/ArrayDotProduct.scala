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
  * Semantics are EXACTLY the fold's, including the degenerate cases —
  * unequal lengths or a null element yield null (zip_with pads the
  * shorter side with null, null poisons the product and then the sum) —
  * so [[graft.plans.NativeDotRewrite]] may substitute this expression
  * for the fold pattern without observable change. Accumulation is
  * index-order like the fold, so results are bit-identical (verified
  * differentially in ArrayDotProductSpec).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

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
    ArrayDotProduct.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.ArrayDotProduct.dotOrNull($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {

  /** Index-order multiply-accumulate with the fold's null semantics:
    * unequal lengths or a null element → null.
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
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
