package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.ArrayDotProduct

/** Optimizer rule rewriting the public-API dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, p) => acc + p) }}}
  *
  * into the native codegen'd [[ArrayDotProduct]]. Users (and graft's own
  * reference implementations) can write the declarative fold; plans run
  * the tight loop. The substitution is observationally exact:
  * ArrayDotProduct reproduces the fold's null semantics (unequal
  * lengths / null elements → null) and accumulates in index order.
  *
  * The match is deliberately strict — the multiply must consume exactly
  * the two zip lambda variables, the merge must add exactly the two
  * merge lambda variables (either order: IEEE754 + and × are
  * commutative), zero must be literal 0.0, the finish lambda must be
  * identity, and both inputs must be array<double> — anything else is
  * left untouched. Registered via
  * [[graft.GraftExtensions.apply injectOptimizerRule]]; exclude with
  * spark.sql.optimizer.excludedRules=graft.plans.NativeDotRewrite.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(Add(aa: NamedLambdaVariable, ab: NamedLambdaVariable, _),
            Seq(ma: NamedLambdaVariable, mb: NamedLambdaVariable), _),
          LambdaFunction(fv: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
          Set(aa.exprId, ab.exprId) == Set(ma.exprId, mb.exprId) &&
          fv.exprId == fa.exprId &&
          isDoubleArray(a) && isDoubleArray(b) =>
        ArrayDotProduct(a, b)
    }
}
