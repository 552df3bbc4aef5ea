package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.NativeDecimalSum.SumScaledDecimal

/** Rewrites the engine's exact-money-aggregation idiom
  *
  * {{{ CAST(sum(CAST(e AS DECIMAL(p, s))) AS DOUBLE)   -- e: DOUBLE }}}
  *
  * into [[graft.functions.NativeDecimalSum.SumScaledDecimal]] — the same
  * value computed in scaled-long space (per-row multiply+floor, 128-bit
  * long accumulation, one exact conversion per group) instead of a
  * per-row `Double.toString`-backed BigDecimal allocation. Profiled at
  * ~6× on the aggregation stage of the q1 shape (guide §1.2 step 2:
  * per-task work; OPTIMIZATION_r16.md has the numbers and the
  * bit-equality argument, DecimalSumParitySpec pins it on data).
  *
  * Fires only where every condition holds (else the plan is untouched):
  *  - the pattern sits inside an [[Aggregate]]'s aggregate expressions —
  *    window frames and plain projections never match;
  *  - the Sum is non-DISTINCT and unfiltered;
  *  - the inner cast is DOUBLE → DECIMAL(p, s) with 0 ≤ s ≤ 18 and the
  *    OUTER cast re-exposes the sum as DOUBLE — so the decimal value is
  *    an unobservable intermediate and only the (bit-equal) double
  *    leaves the operator. A sum consumed AS decimal (compared,
  *    re-cast to string, summed again) is deliberately left alone.
  *
  * Overflow contract (round-17): for p ≤ 18 the aggregate enforces the
  * cast's own DECIMAL(p, s) precision bound per row — an
  * out-of-precision value errors under an ANSI cast and NULLs the row
  * under LEGACY/TRY, exactly like the chain it replaces (pinned in
  * DecimalSumParitySpec). For p ≥ 19 any representable row fits the
  * signed-64 scaled domain up to |x|·10^s < 2^63; beyond that the
  * aggregate fails LOUDLY where the built-in would keep summing in
  * wider decimal — the one documented divergence, opt out per query via
  * `spark.sql.optimizer.excludedRules` (the error message names it).
  *
  * The rewrite preserves output names and expression ids (only the
  * Cast's child subtree is replaced), so nothing above the aggregate
  * re-resolves.
  */
object RewriteDecimalSumAsScaledLong extends Rule[LogicalPlan] {

  private def rewriteExpr(e: Expression): Expression = e match {
    case outer: Cast if outer.dataType == DoubleType =>
      outer.child match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case s: Sum => s.child match {
              case inner: Cast if inner.child.dataType == DoubleType =>
                inner.dataType match {
                  case d: DecimalType if d.scale >= 0 && d.scale <= 18 =>
                    // carry the cast's DECIMAL(p, s) overflow contract:
                    // for p ≤ 18 the per-row precision bound is 10^p
                    // (enforced with the cast's own eval mode — ANSI
                    // errors, LEGACY/TRY nulls the row); for p ≥ 19 any
                    // value inside the signed-64 scaled domain is within
                    // precision by construction (2^63 < 10^19), so no
                    // bound is needed
                    val bound =
                      if (d.precision <= 18)
                        math.round(math.pow(10, d.precision))
                      else 0L
                    ae.copy(aggregateFunction =
                      SumScaledDecimal(inner.child, d.scale, bound,
                        inner.evalMode == EvalMode.ANSI))
                  case _ => e
                }
              case _ => e
            }
            case _ => e
          }
        case _ => e
      }
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate =>
      val rewritten = a.aggregateExpressions.map { ne =>
        ne.transform { case e => rewriteExpr(e) }
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
      }
      if (rewritten == a.aggregateExpressions) a
      else a.copy(aggregateExpressions = rewritten)
  }
}
