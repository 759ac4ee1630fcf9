package org.apache.spark.sql.graftfn

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the portable higher-order-function dot
  * product — the exact decimal-quantized shape
  * [[graft.llm.Similarity.dotExprHof]] emits,
  *
  * {{{
  * CAST(aggregate(zip_with(a, b,
  *        (x, y) -> CAST(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
  *                       AS DECIMAL(18,4)) * 10000 AS BIGINT)),
  *      0L, (acc, p) -> acc + p) AS DOUBLE) / 10000.0
  * }}}
  *
  * — into the native allocation-free [[Dot4]] codegen loop. A SQL user
  * who writes the portable form (it is the only way to express an exact
  * order-independent float dot product in pure built-ins) silently gets
  * the ~3× hot-path expression; declarative plans stay declarative.
  *
  * SOUNDNESS: the match is deliberately exact — float-array inputs, the
  * full decimal-quantization lambda with its variables in position, the
  * 0L seed, the `acc + p` merge, the identity finish, and the 10⁴
  * descale — so no other zip_with/aggregate composition can be touched.
  * [[Dot4]] mirrors this formulation bit-for-bit on every fixture (the
  * LlmSpec cross-check); the one documented divergence is products
  * whose scaled value sits within one double ULP of an exact .5
  * rounding boundary (see the Dot4 Scaladoc) — measure-zero for real
  * embeddings. Deployments that need the literal HOF semantics anyway
  * can set `spark.graft.rewriteHofDot.enabled=false`.
  *
  * Injected by [[GraftExtensions]] (config-path sessions) and
  * [[GraftExtensions.register]] (live sessions, via
  * `spark.experimental.extraOptimizations`).
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewriteHofDot.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case QuantizedHofDot(l, r) => Dot4(l, r)
    }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def foldsTo(e: Expression, v: Double): Boolean =
    e.foldable && (e.eval() match {
      case d: java.lang.Double => d == v
      case d: Decimal => d.toDouble == v
      case _ => false
    })

  /** The quantizing lambda body: CAST(CAST(CAST(x AS DOUBLE) * CAST(y AS
    * DOUBLE) AS DECIMAL(18,4)) * 10000 AS BIGINT), with x/y matched by
    * exprId against the lambda's own arguments. */
  private def quantizedMul(body: Expression, x: NamedLambdaVariable,
                           y: NamedLambdaVariable): Boolean = body match {
    case Cast(Multiply(
        Cast(Multiply(
          Cast(xr: NamedLambdaVariable, DoubleType, _, _),
          Cast(yr: NamedLambdaVariable, DoubleType, _, _), _),
          DecimalType.Fixed(18, 4), _, _),
        tenK, _), LongType, _, _) =>
      xr.exprId == x.exprId && yr.exprId == y.exprId && foldsTo(tenK, 10000.0)
    case _ => false
  }

  private object QuantizedHofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Divide(
          Cast(ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(body,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(
              Add(accR: NamedLambdaVariable, pR: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, p: NamedLambdaVariable), _),
            LambdaFunction(idR: NamedLambdaVariable,
              Seq(idv: NamedLambdaVariable), _)),
            DoubleType, _, _),
          divisor, _)
          if isFloatArray(l) && isFloatArray(r) &&
             accR.exprId == acc.exprId && pR.exprId == p.exprId &&
             idR.exprId == idv.exprId &&
             foldsTo(divisor, 10000.0) && quantizedMul(body, x, y) =>
        Some((l, r))
      case _ => None
    }
  }
}
