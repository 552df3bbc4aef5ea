package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Expression, GreaterThan, Literal,
  NamedExpression, ReplicateRows}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Folds `count(1)`-style aggregates over a `ReplicateRows` generate into
  * `sum(multiplicity)` over the generate's child — the rows are never
  * materialized.
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
  *   Aggregate(G, …count(lit)…, [Project(pass-through)] Generate(ReplicateRows(m, cols…), child))
  * ⇒ Aggregate(G′, …sum(m)…,   Filter(m > 0, child))
  * }}}
  * The `m > 0` pre-filter reproduces Generate's semantics for
  * non-positive multiplicities (such rows emit nothing, so a group whose
  * every row has `m ≤ 0` must not exist) and makes the sum exactly the
  * generated-row count. Output attribute ids are preserved, so nothing
  * above the aggregate re-resolves.
  *
  * Fires only when every condition holds (else leaves the plan alone):
  *  - grouping is non-empty (a global aggregate over an empty generate
  *    yields one `count = 0` row that the fold could not reproduce);
  *  - every aggregate function is a non-distinct, unfiltered
  *    `Count(foldable non-null…)` — `count(*)` / `count(1)`;
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
    if (!aggFns.forall(isFoldableCount)) return None

    // inline the intermediate Project, swap counts for sum(mult)
    def rewriteNamed(ne: NamedExpression): NamedExpression = ne match {
      case a: Alias =>
        val folded = inline(a.child, subst).transformUp {
          case ae: AggregateExpression if isFoldableCount(ae) =>
            ae.copy(aggregateFunction = Sum(mult))
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
