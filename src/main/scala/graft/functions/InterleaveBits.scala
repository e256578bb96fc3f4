package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) code of two int columns: bits interleaved into one
  * long whose ordering clusters BOTH dimensions. Sorting files by this
  * key bounds every file's min/max range in each dimension, so parquet
  * row-group stats prune scans filtered on either column — the
  * data-layout half of multi-dimensional pruning (the scan half is
  * built-in). Inputs are compared in unsigned-after-sign-flip order so
  * negative values sort before positive ones, matching SQL ordering.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires (int, int), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.InterleaveBits.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  /** Spread the low 32 bits of `x` to the even bit positions. */
  private def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code; input sign bits flipped so each dimension orders
    * numerically, and the RESULT's sign bit flipped so signed Long
    * comparison equals unsigned Z-curve order (the top bit of the code
    * is dimension b's high bit, which would otherwise make half the
    * codes negative).
    */
  def interleave(a: Int, b: Int): Long =
    (spread((a ^ Int.MinValue).toLong) |
      (spread((b ^ Int.MinValue).toLong) << 1)) ^ Long.MinValue

  def ofColumns(a: Column, b: Column): Column =
    ColumnBridge.column(
      InterleaveBits(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
