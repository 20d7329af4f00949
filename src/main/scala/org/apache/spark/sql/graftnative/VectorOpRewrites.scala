package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (injected via GraftExtensions): rewrites the
  * higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the fused native [[DotProduct]] expression. The HOF formulation
  * allocates an intermediate array and dispatches two lambdas per element
  * (both interpreted — higher-order functions don't participate in
  * codegen); the rewrite turns it into one codegen'd primitive loop, so
  * any user writing the idiomatic composition gets native speed.
  *
  * Matching is strict: the multiply must consume exactly the zip_with
  * lambda's two variables, the merge must be acc + element over a 0.0
  * seed, and the finish lambda must be identity — anything else is left
  * untouched.
  */
object VectorOpRewrites extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aacc: NamedLambdaVariable, av: NamedLambdaVariable, _),
              Seq(macc: NamedLambdaVariable, mv: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
          if sameVars(mx, my, zx, zy) && aacc.exprId == macc.exprId &&
            av.exprId == mv.exprId && fin.exprId == facc.exprId &&
            agg.dataType == DoubleType =>
        DotProduct(a, b)
    }

  /** multiply args are the zip lambda's vars, in either order */
  private def sameVars(
      mx: NamedLambdaVariable, my: NamedLambdaVariable,
      zx: NamedLambdaVariable, zy: NamedLambdaVariable): Boolean =
    (mx.exprId == zx.exprId && my.exprId == zy.exprId) ||
      (mx.exprId == zy.exprId && my.exprId == zx.exprId)
}
