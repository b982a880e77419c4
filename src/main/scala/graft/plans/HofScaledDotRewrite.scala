package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.ScaledDot

/** Optimizer rule: rewrite the higher-order-function scaled-dot pattern to
  * the native codegen'd [[ScaledDot]].
  *
  * `aggregate(zip_with(a, b, (x, y) -> round(x·y·1e12)), 0.0, (acc, v) ->
  * acc + v)` is the form a user writes from the documentation of the
  * determinism contract — and it is CodegenFallback: an interpreter loop
  * with a lambda-variable box per element, inside the hottest kernels
  * (similarity joins). The library's own code calls `scaled_dot`
  * directly ([[graft.operators.Vectors.dotScaled]]); this rule gives
  * handwritten HOF queries the same 3-8× kernel for free. The norm form
  * (`aggregate(transform(a, x -> round(x·x·1e12)), ...)`) rewrites to
  * `scaled_dot(a, a)`.
  *
  * Semantics are identical by construction ([[ScaledDot]] mirrors the HOF
  * chain's null/length behavior bit-for-bit; ScaledDotSpec holds the
  * differential). Anything that doesn't match the exact scaled-product
  * shape — different constant, different fold, extra terms — is left
  * untouched, so the rule can never change a non-matching plan.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) — builder-brief extension ladder step (c).
  * Disable for A/B measurement with
  * `spark.sql.optimizer.excludedRules=graft.plans.HofScaledDotRewrite`. */
object HofScaledDotRewrite extends Rule[LogicalPlan] {

  /** The lambda variable itself, looking through a widening cast to
    * double (present when the array element type is float). */
  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable             => nv.exprId == v.exprId
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
    case _                                   => false
  }

  /** `round(x · y · 1e12)` (either operand order) over the lambda vars. */
  private def isScaledProduct(e: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = e match {
    case r: Round =>
      (r.scale, r.child) match {
        case (Literal(0, _), Multiply(Multiply(a, b, _), Literal(s: Double, DoubleType), _))
            if s == 1e12 =>
          (sameVar(a, x) && sameVar(b, y)) || (sameVar(a, y) && sameVar(b, x))
        case _ => false
      }
    case _ => false
  }

  private def isPlainAdd(f: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = f match {
    case Add(l, r, _) =>
      (sameVar(l, acc) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, acc))
    case _ => false
  }

  private def isIdentity(l: LambdaFunction): Boolean = l match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => sameVar(body, v)
    case _ => false
  }

  /** [[ScaledDot]] only reads float/double arrays; the rewrite happens
    * post-analysis so its checkInputDataTypes never runs — an int-array
    * chain (its per-element cast also matches [[sameVar]]) must stay a
    * plain HOF aggregate. */
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dot form: aggregate(zip_with(a, b, round(x·y·1e12)), 0.0, +)
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish: LambdaFunction)
          if isFloatArray(a) && isFloatArray(b) &&
            isScaledProduct(body, x, y) && isPlainAdd(merge, acc, v) &&
            isIdentity(finish) =>
        ScaledDot(a, b)
      // norm form: aggregate(transform(a, round(x·x·1e12)), 0.0, +)
      case ArrayAggregate(
          ArrayTransform(a, LambdaFunction(body, Seq(x: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish: LambdaFunction)
          if isFloatArray(a) && isScaledProduct(body, x, x) &&
            isPlainAdd(merge, acc, v) && isIdentity(finish) =>
        ScaledDot(a, a)
    }
}
