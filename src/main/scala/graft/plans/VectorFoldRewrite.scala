package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.VectorDot

/** Optimizer rule: recognize the higher-order-function dot-product
  * fold — `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  * 0.0, (acc, v) => acc + v)` — and replace it with the native
  * codegen'd [[graft.functions.VectorDot]].
  *
  * The two are semantically identical bit for bit (see
  * VectorExpressions scaladoc): left-to-right double accumulation,
  * null on length mismatch (zip_with pads with null, null poisons the
  * sum) and on any null element, 0.0 for empty arrays. The fold,
  * however, evaluates interpreted lambdas per element; the native
  * expression is a primitive loop inside whole-stage codegen.
  *
  * Registered via GraftSparkExtensions (injectOptimizerRule), so SQL
  * and DataFrame pipelines written in the portable fold style get the
  * fast path without a code change — the same contract Catalyst's own
  * rewrites (e.g. ReplaceExpressions) provide.
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  private def isVectorArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** The lambda body reads `v` widened to double: either the variable
    * itself (already double) or exactly `cast(v as double)`. */
  private def readsAsDouble(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case nv: NamedLambdaVariable => nv.exprId == v.exprId
        case _ => false
      }
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(m: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(a: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(farg: NamedLambdaVariable), _))
          if isVectorArray(l) && isVectorArray(r) &&
            readsAsDouble(m.left, x) && readsAsDouble(m.right, y) &&
            sameVar(a.left, acc) && sameVar(a.right, v) &&
            sameVar(fin, farg) =>
        VectorDot(l, r)
    }
}
