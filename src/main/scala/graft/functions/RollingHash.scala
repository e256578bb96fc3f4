package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the base-31 mod 1e9+7 rolling hash
  * (TextOps.rollingHash semantics): one tight per-row loop with codegen,
  * versus the higher-order `aggregate(split(s,""), …)` fold which
  * allocates a per-character array and evaluates interpreted lambdas.
  * Semantics match the fold (and the DuckDB oracle) for all BMP text:
  * the fold hashes per-character code points, as does this loop.
  *
  * This is the pattern for dropping below the public API when a hot
  * scalar has no codegen-friendly built-in: a UnaryExpression with
  * `doGenCode` generating a static call, registered for SQL use via
  * [[graft.GraftExtensions]] and exposed to the DataFrame API through
  * [[RollingHash.ofColumn]].
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  final val Mod = 1000000007L

  /** The fold itself; static so generated code calls it directly. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** DataFrame-API entry point (no function-registry dependence). */
  def ofColumn(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
