package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Second independent rolling hash — base 131 mod 998244353 — the
  * rank-hash companion to [[RollingHash]] (base 31 mod 1e9+7) for
  * sketches that need two structurally independent hash coordinates
  * (bucket vs rank in [[Hll]]). Different base AND different prime
  * modulus, so the two folds are linear maps over distinct fields and
  * share no collision structure beyond chance.
  *
  * Same native-codegen rationale and DuckDB replay contract as
  * [[RollingHash]]: one tight per-row loop, and the oracle recomputes
  * the identical fold with `list_reduce(…, (a,b) -> (a*131+b) %
  * 998244353)`. All arithmetic stays far under 2^63
  * (131 · 998244352 + cp < 2^38).
  */
case class RollingHash2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash2 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash2"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash2.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash2.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash2 =
    copy(child = newChild)
}

object RollingHash2 {

  final val Mod = 998244353L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 131 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def ofColumn(c: Column): Column =
    ColumnBridge.column(RollingHash2(ColumnBridge.expression(c)))
}
