package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, AttributeSet, EqualTo, Expression,
  IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Declared data constraints that the optimizer is allowed to TRUST.
  *
  * The reference pipeline gets integrity for free from Postgres — its
  * unique index (`/root/reference/database/schema.sql:31-33`) is both a
  * constraint and an access path. A parquet lake has no enforced
  * constraints, so this catalog carries them as *informational*
  * declarations (the Snowflake / Oracle RELY model): the engine does not
  * enforce them on write, but [[EliminateRiDimJoin]] uses them to remove
  * provably-redundant joins. A wrong declaration therefore produces wrong
  * answers by design — which is why [[declareAudited]] exists: it runs the
  * repo's own [[graft.ops.Constraints]] audit (Unique on the dimension
  * key, RefIntegrity on the fact FK) and only declares claims the data
  * actually passed, tying the optimizer's trust to the same gate that
  * already fronts corpus publishing.
  *
  * Keys are (normalized table path, column name): path-addressed because
  * this engine's tables are parquet directories, not catalog entries. The
  * registry is JVM-global and thread-safe; declarations are tiny and
  * idempotent. Specs use [[clear]] for isolation.
  */
object ConstraintCatalog {

  private val uniqueKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  // (factPath, fkCol) -> (dimPath, pkCol): every non-null fk value
  // appears in dim.pk
  private val foreignKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[((String, String), (String, String))]()

  /** Strip the URI scheme and trailing slashes so `file:/x/y/` declared by
    * a user matches `/x/y` reported by a scan's `rootPaths` (and vice
    * versa). */
  def normalize(path: String): String = {
    val p =
      try {
        val u = new java.net.URI(path)
        if (u.getScheme == null) path else u.getPath
      } catch { case _: java.net.URISyntaxException =>
        // not URI-parseable (e.g. an unescaped space from a hive
        // partition value like "4-NOT SPECIFIED") — strip a scheme
        // prefix textually so "file:/x/a b" still matches "/x/a b"
        path.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:(//)?", "")
      }
    val trimmed = p.replaceAll("/+$", "")
    if (trimmed.isEmpty) "/" else trimmed
  }

  def declareUnique(tablePath: String, col: String): Unit =
    uniqueKeys.add((normalize(tablePath), col))

  def declareForeignKey(factPath: String, fkCol: String,
      dimPath: String, pkCol: String): Unit =
    foreignKeys.add(((normalize(factPath), fkCol), (normalize(dimPath), pkCol)))

  def isUnique(tablePath: String, col: String): Boolean =
    uniqueKeys.contains((normalize(tablePath), col))

  def isForeignKey(factPath: String, fkCol: String,
      dimPath: String, pkCol: String): Boolean =
    foreignKeys.contains(
      ((normalize(factPath), fkCol), (normalize(dimPath), pkCol)))

  /** The declared table directory that COVERS every given normalized
    * scan root, if any — how a snapshot read (a commit-log table lists
    * its data FILES as the scan's root paths) maps back to the
    * directory its constraints were declared on. Path-addressed like
    * everything in this catalog: the declaration is trusted (RELY) for
    * whatever data lives under that directory, current or
    * time-traveled — the same contract as a directory scan read at two
    * different times. */
  def coveringDeclared(paths: Seq[String]): Option[String] = {
    import scala.jdk.CollectionConverters._
    val declared =
      uniqueKeys.asScala.map(_._1).toSet ++
        foreignKeys.asScala.flatMap(p => Seq(p._1._1, p._2._1))
    declared.find(d => paths.forall(p => p == d || p.startsWith(d + "/")))
  }

  /** Audit-then-declare: verifies the unique + referential-integrity
    * claims against the actual parquet data with
    * [[graft.ops.Constraints.audit]] and declares them only when both
    * pass. Returns true when declared. One fact scan + one dim scan —
    * meant for publish time (alongside the corpus audit gate), not per
    * query. */
  def declareAudited(spark: org.apache.spark.sql.SparkSession,
      factPath: String, fkCol: String,
      dimPath: String, pkCol: String): Boolean = {
    import graft.ops.Constraints
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.parquet(factPath)
    val dimOk = Constraints.audit(dim, Seq(Constraints.Unique(Seq(pkCol))))
      .filter(org.apache.spark.sql.functions.col("violations") > 0L)
      .isEmpty
    val factOk = Constraints.audit(fact,
        Seq(Constraints.RefIntegrity(fkCol, dim, pkCol)))
      .filter(org.apache.spark.sql.functions.col("violations") > 0L)
      .isEmpty
    if (dimOk && factOk) {
      declareUnique(dimPath, pkCol)
      declareForeignKey(factPath, fkCol, dimPath, pkCol)
      true
    } else false
  }

  def clear(): Unit = { uniqueKeys.clear(); foreignKeys.clear() }

  private val PropKey = "graft.constraints"

  /** [[declareAudited]] that also PERSISTS the passing declarations
    * into the fact table's commit log (`graft.constraints` property),
    * so a fresh session can [[restore]] them — the fact table must be
    * a [[graft.sources.CommitLog]] table. Returns false (and persists
    * nothing) when the audit fails. */
  def declareAuditedLogged(spark: org.apache.spark.sql.SparkSession,
      factDir: String, fkCol: String,
      dimPath: String, pkCol: String): Boolean = {
    if (!declareAudited(spark, factDir, fkCol, dimPath, pkCol)) return false
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val prior = graft.sources.CommitLog.latest(spark, factDir)
      .flatMap(_.props.get(PropKey))
      .map(s => JsonMethods.parse(s).extract[List[Map[String, String]]])
      .getOrElse(Nil)
    val entry = Map("fkCol" -> fkCol, "dimPath" -> normalize(dimPath),
      "pkCol" -> pkCol)
    val merged = (prior.filterNot(e =>
      e.get("fkCol") == entry.get("fkCol") &&
        e.get("dimPath") == entry.get("dimPath") &&
        e.get("pkCol") == entry.get("pkCol")) :+ entry)
    val json = JsonMethods.compact(JsonMethods.render(
      JArray(merged.map(m => JObject(m.toList.map {
        case (k, v) => JField(k, JString(v))
      })))))
    graft.sources.CommitLog.setProps(spark, factDir, Map(PropKey -> json))
    true
  }

  /** Re-declare every constraint persisted on `factDir`'s log into this
    * session's registry (unique on the dim key + the fk reference).
    * Returns the number restored. The declarations were audited when
    * persisted; restoring trusts them (RELY) without re-scanning. */
  def restore(spark: org.apache.spark.sql.SparkSession,
      factDir: String): Int = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val entries = graft.sources.CommitLog.latest(spark, factDir)
      .flatMap(_.props.get(PropKey))
      .map(s => JsonMethods.parse(s).extract[List[Map[String, String]]])
      .getOrElse(Nil)
    entries.foreach { e =>
      declareUnique(e("dimPath"), e("pkCol"))
      declareForeignKey(factDir, e("fkCol"), e("dimPath"), e("pkCol"))
    }
    entries.size
  }
}

/** Removes a dimension join that provably cannot change the fact side.
  *
  * The classic informational-constraint optimization (Oracle/Snowflake
  * RELY, Trino's join pruning): for
  * {{{ fact JOIN dim ON fact.fk = dim.pk }}}
  * where `dim.pk` is declared UNIQUE and `fact.fk` is declared to
  * REFERENCE it, and nothing above the join uses any `dim` column except
  * `pk` itself, the join is an expensive identity:
  *
  *  - uniqueness ⇒ at most one match per fact row (no duplication);
  *  - referential integrity ⇒ every non-null fk has exactly one match
  *    (no elimination beyond the nulls);
  *  - on the surviving rows `pk = fk`, so `pk` references rewrite to `fk`.
  *
  * Rewrites (dim side must reduce to a bare scan of the declared table —
  * a pass-through Project / IsNotNull(pk) filter is allowed, anything
  * else could drop pk values and blocks the rewrite):
  * {{{
  *   INNER:      Project/Aggregate(refs∩dim ⊆ {pk}, fact ⋈ dim)
  *             ⇒ Project/Aggregate(pk→fk,  Filter(IsNotNull(fk), fact))
  *   LEFT OUTER: same shape ⇒ Project/Aggregate(pk→fk, fact)
  *               (null fk rows keep dim-nulls either way: pk→fk maps
  *                the padded null to the equally-null fk)
  *   LEFT SEMI:  fact ⋉ dim ⇒ Filter(IsNotNull(fk), fact)
  * }}}
  *
  * Why it matters at 100 TB: the canonical star-schema query joins the
  * fact table to every dimension its BI tool *might* display, then
  * aggregates by the key columns alone. Each redundant broadcast join
  * still costs a broadcast build + a probe per fact row — and a
  * *shuffle* join costs a full exchange of the fact table. This rule
  * deletes that work entirely; downstream, column pruning narrows the
  * scan the dimension no longer forces.
  *
  * Soundness gates (all checked, else the plan is left alone):
  *  - the join condition is a single bare-attribute equality (a cast on
  *    either side blocks the value-identity argument);
  *  - fk provenance: the fk attribute (by exprId) traces to a scan of
  *    the declared fact table's declared column — sound because plan
  *    operators can only *drop* rows or pass the attribute through for a
  *    given exprId (an alias or computed column gets a fresh exprId), so
  *    the attribute's non-null values are always a subset of the scanned
  *    column's, and subsets preserve referential integrity. Outer joins
  *    below may *null-inject* the fk, which both sides of each rewrite
  *    treat identically (see LEFT OUTER above);
  *  - the parent is the projection boundary (Project or Aggregate), so
  *    every reference to the dim side is visible in one place. Catalyst's
  *    own ColumnPruning inserts exactly such a Project when a query stops
  *    using dim columns, and this rule runs inside the same fixed point
  *    ([[graft.functions.GraftExtensions]]), so the two compose.
  *
  * Output attribute ids are preserved: a surviving `pk` reference becomes
  * `Alias(fk, pkName)(exprId = pk's id)`, so operators above the rewritten
  * node never re-resolve.
  */
object EliminateRiDimJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, LeftSemi, Some(EqualTo(a, b)), _) =>
      bareKeys(a, b, left, right) match {
        case Some((fk, pk)) if eliminable(left, fk, right, pk) =>
          Filter(IsNotNull(fk), left)
        case _ => j
      }
    case p @ Project(list, j: Join) =>
      tryEliminate(p.references, j) match {
        case Some((newChild, pk, fk)) =>
          Project(list.map(substNamed(_, pk, fk)), newChild)
        case None => p
      }
    case a @ Aggregate(groupings, aggs, j: Join, hint) =>
      tryEliminate(a.references, j) match {
        case Some((newChild, pk, fk)) =>
          Aggregate(groupings.map(substExpr(_, pk, fk)),
            aggs.map(substNamed(_, pk, fk)), newChild, hint)
        case None => a
      }
  }

  /** Both equality operands must be bare attributes, one from each side;
    * returns them oriented as (fact-side fk, dim-side pk) for dim=right. */
  private def bareKeys(a: Expression, b: Expression,
      fact: LogicalPlan, dim: LogicalPlan): Option[(Attribute, Attribute)] =
    (a, b) match {
      case (x: AttributeReference, y: AttributeReference) =>
        if (fact.outputSet.contains(x) && dim.outputSet.contains(y)) Some((x, y))
        else if (fact.outputSet.contains(y) && dim.outputSet.contains(x)) Some((y, x))
        else None
      case _ => None
    }

  /** Inner / left-outer elimination given the parent's reference set.
    * Tries the right side as the dimension; for inner joins, also the
    * left. Returns (replacement child, pk, fk). */
  private def tryEliminate(parentRefs: AttributeSet, j: Join)
      : Option[(LogicalPlan, Attribute, Attribute)] = j match {
    case Join(left, right, Inner, Some(EqualTo(a, b)), _) =>
      def attempt(fact: LogicalPlan, dim: LogicalPlan) =
        bareKeys(a, b, fact, dim).collect {
          case (fk, pk) if refsConfined(parentRefs, dim, pk) &&
              eliminable(fact, fk, dim, pk) =>
            (Filter(IsNotNull(fk), fact), pk, fk)
        }
      attempt(left, right).orElse(attempt(right, left))
    case Join(left, right, LeftOuter, Some(EqualTo(a, b)), _) =>
      bareKeys(a, b, left, right).collect {
        case (fk, pk) if refsConfined(parentRefs, right, pk) &&
            eliminable(left, fk, right, pk) =>
          (left, pk, fk)
      }
    case _ => None
  }

  /** Nothing of the dim side except possibly pk is referenced above. */
  private def refsConfined(parentRefs: AttributeSet, dim: LogicalPlan,
      pk: Attribute): Boolean =
    parentRefs.intersect(dim.outputSet).subsetOf(AttributeSet(pk :: Nil))

  /** The constraint pair is declared for (fact table, fk) → (dim table,
    * pk), with both attributes traced to their scans. */
  private def eliminable(fact: LogicalPlan, fk: Attribute,
      dim: LogicalPlan, pk: Attribute): Boolean =
    (pkScan(dim, pk), scanOf(fact, fk)) match {
      case (Some((dimPath, pkName)), Some((factPath, fkName))) =>
        ConstraintCatalog.isUnique(dimPath, pkName) &&
          ConstraintCatalog.isForeignKey(factPath, fkName, dimPath, pkName)
      case _ => false
    }

  /** The dim side must be a single-root-path scan reached only through
    * pass-through Projects and IsNotNull(pk)-only Filters: any other
    * filter could remove pk values and void the RI match guarantee. */
  private def pkScan(plan: LogicalPlan, pk: Attribute)
      : Option[(String, String)] = plan match {
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      pkScan(child, pk)
    case Filter(cond, child) if onlyIsNotNullOf(cond, pk) =>
      pkScan(child, pk)
    case lr: LogicalRelation => scanPathAndName(lr, pk)
    case _ => None
  }

  private def onlyIsNotNullOf(cond: Expression, pk: Attribute): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.And
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).forall {
      case IsNotNull(a: AttributeReference) => a.exprId == pk.exprId
      case _ => false
    }
  }

  /** Find the scan whose output carries the attribute, returning its
    * normalized path and the column's name at the scan — walking ONLY
    * through operators that provably keep the attribute's value set a
    * SUBSET of the scanned column's (row-dropping or pass-through for
    * that exprId): Project with the bare attribute, Filter, either side
    * of a Join, grouping-key pass-through in Aggregate, Window, sorts,
    * limits, sample, distinct, aliases.
    *
    * NOT a blind `collectFirst`: operators like Union REUSE the head
    * child's exprIds while other branches contribute arbitrary values —
    * a collectFirst would trace the attribute to the first branch's
    * declared scan and wave through fk values the other branches
    * injected, keeping rows a real join would drop. Union (and any
    * operator not whitelisted) therefore terminates the walk with None
    * and blocks the elimination. */
  private def scanOf(plan: LogicalPlan, attr: Attribute)
      : Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case lr: LogicalRelation if lr.outputSet.contains(attr) =>
        scanPathAndName(lr, attr)
      case p: Project
          if p.projectList.exists {
            case a: AttributeReference => a.exprId == attr.exprId
            case _ => false
          } => scanOf(p.child, attr)
      case f: Filter => scanOf(f.child, attr)
      case j: Join =>
        if (j.left.outputSet.contains(attr)) scanOf(j.left, attr)
        else if (j.right.outputSet.contains(attr)) scanOf(j.right, attr)
        else None
      case a: Aggregate
          if a.groupingExpressions.exists {
            case g: AttributeReference => g.exprId == attr.exprId
            case _ => false
          } => scanOf(a.child, attr)
      case w: Window => scanOf(w.child, attr)
      case s: Sort => scanOf(s.child, attr)
      case l: GlobalLimit => scanOf(l.child, attr)
      case l: LocalLimit => scanOf(l.child, attr)
      case s: Sample => scanOf(s.child, attr)
      case d: Distinct => scanOf(d.child, attr)
      case s: SubqueryAlias => scanOf(s.child, attr)
      case r: RepartitionOperation => scanOf(r.child, attr)
      case _ => None
    }
  }

  private def scanPathAndName(lr: LogicalRelation, attr: Attribute)
      : Option[(String, String)] = lr.relation match {
    case h: HadoopFsRelation =>
      val name = lr.output.find(_.exprId == attr.exprId).map(_.name)
      h.location.rootPaths.toList
        .map(p => ConstraintCatalog.normalize(p.toString)) match {
        case single :: Nil => name.map(n => (single, n))
        case many if many.nonEmpty =>
          // commit-log snapshot scans list data FILES as root paths;
          // resolve them back to the declared directory covering all
          for {
            n <- name
            d <- ConstraintCatalog.coveringDeclared(many)
          } yield (d, n)
        case _ => None
      }
    case _ => None
  }

  /** Replace pk references inside an expression with fk. */
  private def substExpr(e: Expression, pk: Attribute, fk: Attribute): Expression =
    e.transformUp {
      case a: AttributeReference if a.exprId == pk.exprId => fk
    }

  /** Same, preserving the output name AND exprId when the pk itself is an
    * output column, so nothing above re-resolves. */
  private def substNamed(ne: NamedExpression, pk: Attribute,
      fk: Attribute): NamedExpression = ne match {
    case a: AttributeReference if a.exprId == pk.exprId =>
      Alias(fk, a.name)(a.exprId, a.qualifier)
    case al: Alias =>
      al.copy(child = substExpr(al.child, pk, fk))(al.exprId, al.qualifier,
        al.explicitMetadata, al.nonInheritableMetadataKeys)
    case other =>
      substExpr(other, pk, fk) match {
        case n: NamedExpression => n
        case changed => Alias(changed, other.name)(other.exprId)
      }
  }
}
