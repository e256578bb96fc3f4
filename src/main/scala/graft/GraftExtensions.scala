package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{AdcLookupSum, ArrayDotProduct, RollingHash, RollingHash2}

/** Session extensions: registers graft's native SQL functions. Opt in
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * after which `SELECT graft_rolling_hash(text)` works in plain SQL.
  * The DataFrame API does not require this (RollingHash.ofColumn builds
  * the expression directly).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_rolling_hash takes exactly 1 argument")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_hash2"),
      new ExpressionInfo(classOf[RollingHash2].getName, "graft_rolling_hash2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_rolling_hash2 takes exactly 1 argument")
        RollingHash2(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc_sum"),
      new ExpressionInfo(classOf[AdcLookupSum].getName, "graft_adc_sum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          "graft_adc_sum takes exactly 3 arguments: codes, lut, k")
        val kExpr = children(2)
        require(kExpr.foldable &&
          kExpr.dataType == org.apache.spark.sql.types.IntegerType,
          "graft_adc_sum: k must be an integer literal")
        // eval() of a foldable NULL int (CAST(NULL AS INT)) is null;
        // the asInstanceOf unboxes it to 0, which would surface as a
        // misleading "requires a positive k, got 0" downstream
        val kVal = kExpr.eval()
        require(kVal != null,
          "graft_adc_sum: k must be a non-null integer literal")
        AdcLookupSum(children.head, children(1),
          kVal.asInstanceOf[Int])
      }))
    // declaratively-written dot-product folds run the native loop
    ext.injectOptimizerRule(_ => graft.plans.NativeDotRewrite)
  }
}
