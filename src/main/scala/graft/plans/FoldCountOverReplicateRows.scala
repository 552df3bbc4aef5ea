package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Cast, Divide, Expression, GreaterThan,
  If, IsNull, Literal, Multiply, NamedExpression, ReplicateRows}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType,
  ShortType}

/** Folds `count(1)`/`sum(x)`/`avg(x)` aggregates over a `ReplicateRows`
  * generate into multiplicity-weighted sums over the generate's child —
  * the replicated rows are never materialized.
  *
  * Why this exists: Catalyst rewrites `EXCEPT ALL` / `INTERSECT ALL`
  * (RewriteExceptAll / RewriteIntersectAll) into an aggregate that
  * computes each surviving row's multiplicity, followed by
  * `Generate(ReplicateRows(mult, cols…))` that physically emits `mult`
  * copies of every row. A query that then only COUNTS those copies —
  * `setop GROUP BY k` + `count(*)`, or `SELECT DISTINCT` over the setop —
  * pays for materializing the full multiset and re-aggregating it: at
  * 100 TB the replicated intermediate can dwarf both inputs, and the
  * re-aggregation is a second full shuffle. The count of generated copies
  * per group is just the sum of the multiplicities, which the plan
  * already holds one row per key BEFORE replication, partitioned by
  * exactly the keys the outer aggregate needs — so the fold removes the
  * row explosion AND the second exchange.
  *
  * Rewrite (exact, not approximate):
  * {{{
  *   Aggregate(G, …count(lit)…,  [Project] Generate(ReplicateRows(m, cols…), child))
  * ⇒ Aggregate(G′, …sum(m)…,    Filter(m > 0, child))
  *   count(1) over m copies      = m              → sum(m)
  *   sum(x)   over m copies of x = x·m            → sum(x·m)
  *   avg(x)   over m copies      = Σ x·m ⁄ Σ[x≠∅]·m → sum(x·m)/sum(if(x null, 0, m))
  * }}}
  * The `m > 0` pre-filter reproduces Generate's semantics for
  * non-positive multiplicities (such rows emit nothing, so a group whose
  * every row has `m ≤ 0` must not exist) and makes the sums exactly the
  * generated-row aggregates. Output attribute ids are preserved, so
  * nothing above the aggregate re-resolves.
  *
  * Fires only when every condition holds (else leaves the plan alone):
  *  - grouping is non-empty (a global aggregate over an empty generate
  *    yields one `count = 0` row that the fold could not reproduce);
  *  - every aggregate function is non-distinct and unfiltered, and is
  *    `Count(foldable non-null…)` — `count(*)`/`count(1)` — or
  *    `Sum`/`Average` of an INTEGRAL-typed expression. The integral gate
  *    is the exactness line: `x+x+x` and `3·x` round differently in IEEE
  *    floating point, and decimal products change the result's
  *    precision, so folding those would perturb answers; long arithmetic
  *    makes count/sum folds bit-for-bit identical to the unfolded plan,
  *    and avg's two division operands agree bit-for-bit while the
  *    group's sum stays inside double's 2^53 integer range (past it the
  *    unfolded plan's own double accumulation is already lossy);
  *  - the plan between Aggregate and Generate is at most one
  *    deterministic Project, and after inlining it every reference
  *    resolves against the generate's CHILD output (RewriteExceptAll /
  *    RewriteIntersectAll reuse the child's attribute ids for the
  *    generator output, which is what makes the bypass sound);
  *  - the multiplicity expression is LongType (ReplicateRows' contract).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]), so it participates in the
  * operator-optimization fixed point: the folded aggregate is itself
  * optimized further, and `Filter(m > 0, …)` merges with the positivity
  * filter the setop rewrite already planted.
  */
object FoldCountOverReplicateRows extends Rule[LogicalPlan] {

  private def isReplicateRows(g: Expression): Boolean =
    g.isInstanceOf[ReplicateRows]

  private def isFoldableCount(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(children) =>
        children.forall(c => c.foldable && c.eval(null) != null)
      case _ => false
    })

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** `sum(x)` folds exactly only for integral x (see scaladoc). */
  private def isFoldableSum(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case s: Sum => integral(s.child) && s.child.deterministic
      case _ => false
    })

  private def isFoldableAvg(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case a: Average => integral(a.child) && a.child.deterministic
      case _ => false
    })

  private def isFoldable(ae: AggregateExpression): Boolean =
    isFoldableCount(ae) || isFoldableSum(ae) || isFoldableAvg(ae)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, _, aggChild, _) if groupings.nonEmpty =>
      unwrap(aggChild) match {
        case Some((gen, subst)) =>
          rewrite(agg, gen, subst).getOrElse(agg)
        case None => agg
      }
  }

  /** Strip at most one deterministic Project between the aggregate and a
    * ReplicateRows Generate, returning the Generate plus the Project's
    * alias substitution (attr id → inlined expression). */
  private def unwrap(plan: LogicalPlan)
      : Option[(Generate, Map[Long, Expression])] = plan match {
    case gen @ Generate(g, _, false, _, _, _) if isReplicateRows(g) =>
      Some((gen, Map.empty))
    case Project(projectList, gen @ Generate(g, _, false, _, _, _))
        if isReplicateRows(g) && projectList.forall(_.deterministic) =>
      val subst = projectList.collect {
        case a: Alias => a.exprId.id -> a.child
      }.toMap
      Some((gen, subst))
    case _ => None
  }

  private def inline(e: Expression, subst: Map[Long, Expression]): Expression =
    if (subst.isEmpty) e
    else e.transformUp {
      case a: AttributeReference if subst.contains(a.exprId.id) =>
        subst(a.exprId.id)
    }

  private def rewrite(agg: Aggregate, gen: Generate,
      subst: Map[Long, Expression]): Option[LogicalPlan] = {
    val mult = gen.generator.children.head
    val gchild = gen.child
    if (mult.dataType != LongType || !mult.deterministic) return None

    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (!aggFns.forall(isFoldable)) return None

    // the generator output reuses the child's attribute ids (the setop
    // rewrites' contract), so an aggregated column x must ALSO be
    // inlined before weighting it by the multiplicity
    def weighted(x: Expression): Expression =
      Multiply(Cast(inline(x, subst), LongType), mult)

    // inline the intermediate Project, swap counts/sums/avgs for
    // multiplicity-weighted sums over the pre-replication rows
    def rewriteNamed(ne: NamedExpression): NamedExpression = ne match {
      case a: Alias =>
        val folded = inline(a.child, subst).transformUp {
          case ae: AggregateExpression if isFoldableCount(ae) =>
            ae.copy(aggregateFunction = Sum(mult))
          case ae: AggregateExpression if isFoldableSum(ae) =>
            val s = ae.aggregateFunction.asInstanceOf[Sum]
            ae.copy(aggregateFunction = Sum(weighted(s.child)))
          case ae: AggregateExpression if isFoldableAvg(ae) =>
            // avg over the copies = Σ x·m / Σ m-over-non-null-x; fresh
            // resultIds keep the two sums from aliasing each other
            val x = inline(ae.aggregateFunction.asInstanceOf[Average].child, subst)
            val num = AggregateExpression(
              Sum(Multiply(Cast(x, LongType), mult)), ae.mode, isDistinct = false)
            val den = AggregateExpression(
              Sum(If(IsNull(x), Literal(0L), mult)), ae.mode, isDistinct = false)
            Divide(Cast(num, DoubleType), Cast(den, DoubleType))
        }
        Alias(folded, a.name)(a.exprId, a.qualifier, a.explicitMetadata,
          a.nonInheritableMetadataKeys)
      case attr: Attribute =>
        inline(attr, subst) match {
          case same: Attribute if same.exprId == attr.exprId => attr
          case other => Alias(other, attr.name)(attr.exprId, attr.qualifier)
        }
      case other => other
    }
    val newAggExprs = agg.aggregateExpressions.map(rewriteNamed)
    val newGroupings = agg.groupingExpressions.map(inline(_, subst))

    // soundness gate: everything the folded aggregate evaluates — keys,
    // outputs, and the multiplicity — must resolve against the generate's
    // child (holds for the setop rewrites, which reuse child attr ids)
    val refs = (newGroupings ++ newAggExprs).flatMap(_.references) ++
      mult.references
    if (!refs.forall(gchild.outputSet.contains)) return None

    Some(agg.copy(groupingExpressions = newGroupings,
      aggregateExpressions = newAggExprs,
      child = Filter(GreaterThan(mult, Literal(0L)), gchild)))
  }
}
