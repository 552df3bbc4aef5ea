package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, StringType}

/** SQL DML bindings for [[CommitLog]] lakes — the mutation half of the
  * `spark.sql` front door ([[LakeTvf]] is the read half):
  *
  * {{{
  *   DELETE FROM graft_lake('/lake/orders') WHERE o_custkey % 10 = 3
  *   DELETE FROM graft_lake('/lake/orders') WHERE flag = 'F'
  *     USING DELETION VECTORS                       -- merge-on-read
  *   UPDATE graft_lake('/lake/orders') SET o_totalprice = o_totalprice * 2
  *     WHERE o_orderkey <= 2000
  *   MERGE INTO graft_lake('/lake/orders') AS t
  *   USING (SELECT ...) AS s
  *   ON t.o_orderkey = s.o_orderkey
  *   WHEN MATCHED AND s.o_totalprice < 100 THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   WHEN NOT MATCHED BY SOURCE THEN DELETE         -- opt-in full scan
  *   SELECT * FROM graft_lake('/lake/orders') VERSION AS OF 3
  *   SELECT * FROM graft_lake('/lake/orders') TIMESTAMP AS OF 1700000000000
  * }}}
  *
  * Implementation: the statements above are STANDARD Spark SQL grammar
  * except for the table-function target, the deletion-vector suffix, and
  * the time-travel suffix on a TVF. So the injected parser does minimal
  * text surgery — swap the `graft_lake('dir')` target for a placeholder
  * identifier, strip `USING DELETION VECTORS`, rewrite
  * `VERSION/TIMESTAMP AS OF` sugar into [[LakeTvf]]'s `graft_lake_at` /
  * `graft_lake_asof` — and hands the result to Spark's OWN parser, so
  * the full expression/clause grammar (conditions, assignments, nested
  * source queries) is Spark's, not a re-implementation. The parsed
  * `DeleteFromTable` / `UpdateTable` / `MergeIntoTable` plan is then
  * translated onto the [[CommitLog]] verbs (`delete`, `deleteVectors`,
  * `replaceWhere`, `merge`), which carry the MVCC commit, the rebase
  * rules, and the partition conflict unit — a SQL mutation is exactly a
  * Scala-API mutation.
  *
  * Honest surface limits (all rejected loudly at parse time):
  *  - MERGE actions are whole-row (`UPDATE SET *` / `INSERT *` /
  *    `DELETE`), matching [[CommitLog.merge]]'s source-image semantics;
  *    column-list assignments belong to UPDATE.
  *  - The merge ON clause must be a conjunction of `t.k = s.k` key
  *    equalities (that IS the engine's keyed-merge contract).
  *  - Clause-order semantics are preserved for the matched pair: with
  *    `UPDATE` before `DELETE`, the delete condition is guarded with
  *    `NOT coalesce(updateCond, false)` so a row satisfying both takes
  *    the FIRST clause, exactly as SQL MERGE specifies.
  */
object LakeSqlDml {

  /** `graft_lake('<dir>')` immediately after the DML verb — the TARGET
    * occurrence only, so `graft_lake` reads inside a merge SOURCE query
    * keep resolving through [[LakeTvf]]. */
  private val Target =
    """(?is)\b(MERGE\s+INTO|DELETE\s+FROM|UPDATE)\s+graft_lake\s*\(\s*'([^']+)'\s*\)""".r

  private val DvSuffix =
    """(?is)\s+USING\s+DELETION\s+VECTORS\s*;?\s*$""".r

  private val VersionAsOf =
    """(?is)graft_lake\s*\(\s*'([^']+)'\s*\)\s+VERSION\s+AS\s+OF\s+(\d+)""".r

  private val TimestampAsOf =
    """(?is)graft_lake\s*\(\s*'([^']+)'\s*\)\s+TIMESTAMP\s+AS\s+OF\s+(\d+|'[^']+')""".r

  private[sources] val Placeholder = "graft_dml_target_"

  /** Epoch millis of a `TIMESTAMP AS OF` operand: bare digits are
    * millis; a quoted string is an ISO instant (`...Z`/offset) or a
    * local `yyyy-MM-dd[ HH:mm:ss]` interpreted as UTC — the commit
    * stamps it compares against are UTC wall-clock millis. */
  private[sources] def asOfMillis(raw: String): Long =
    if (raw.forall(_.isDigit)) raw.toLong
    else {
      val s = raw.stripPrefix("'").stripSuffix("'")
      try java.time.Instant.parse(s).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          val norm = if (s.contains(' ') || s.contains('T'))
            s.replace(' ', 'T')
          else s + "T00:00:00"
          java.time.LocalDateTime.parse(norm)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    }

  /** Rewrite the time-travel sugar anywhere in the statement. */
  private[sources] def rewriteTimeTravel(sql: String): String = {
    val v = VersionAsOf.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"graft_lake_at('${m.group(1)}', ${m.group(2)})"))
    TimestampAsOf.replaceAllIn(v, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"graft_lake_asof('${m.group(1)}', ${asOfMillis(m.group(2))}L)"))
  }

  /** Try to handle `sql` as lake DML; None → not ours, delegate. */
  def parseDml(delegate: ParserInterface, sql: String): Option[LogicalPlan] =
    Target.findFirstMatchIn(sql).map { m =>
      val dir = m.group(2)
      val mor = DvSuffix.findFirstIn(sql).isDefined
      val stripped = DvSuffix.replaceFirstIn(sql, "")
      // unique placeholder per statement: no temp-view shadowing risk
      val tag = Placeholder + Integer.toHexString(dir.hashCode).takeWhile(_ != '-')
      val substituted = Target.replaceFirstIn(stripped,
        scala.util.matching.Regex.quoteReplacement(s"${m.group(1)} $tag"))
      delegate.parsePlan(substituted) match {
        case DeleteFromTable(tbl, cond) if targets(tbl, tag) =>
          GraftDeleteCommand(dir, stripAlias(cond, aliasOf(tbl)).sql, mor)
        case UpdateTable(tbl, assignments, cond) if targets(tbl, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          val a = aliasOf(tbl)
          GraftUpdateCommand(dir,
            assignments.map { case Assignment(k, v) =>
              (attrName(k), stripAlias(v, a).sql)
            },
            cond.map(c => stripAlias(c, a).sql))
        case mit: MergeIntoTable if targets(mit.targetTable, tag) =>
          require(!mor, "USING DELETION VECTORS applies to DELETE only")
          translateMerge(dir, mit)
        case other => throw new IllegalArgumentException(
          s"graft_lake('$dir') as a DML target supports DELETE/UPDATE/" +
            s"MERGE only; got ${other.getClass.getSimpleName}")
      }
    }

  private def targets(plan: LogicalPlan, tag: String): Boolean = plan match {
    case SubqueryAlias(_, child) => targets(child, tag)
    case r: UnresolvedRelation => r.multipartIdentifier == Seq(tag)
    case _ => false
  }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  /** Drop a leading target-alias qualifier (`t.col` → `col`) so the
    * condition resolves against the bare snapshot read. */
  private def stripAlias(e: Expression, alias: Option[String]): Expression =
    alias.fold(e) { a =>
      e.transform {
        case u: UnresolvedAttribute
            if u.nameParts.length > 1 && u.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(u.nameParts.tail)
      }
    }

  /** Remap a clause condition's target/source aliases onto the literal
    * `t` / `s` namespaces [[CommitLog.merge]] evaluates its clause SQL
    * in. Unqualified references stay unqualified (they resolve by
    * uniqueness, as in any join). */
  private def remapAliases(e: Expression, tAlias: Option[String],
      sAlias: Option[String]): Expression =
    e.transform {
      case u: UnresolvedAttribute if u.nameParts.length > 1 =>
        val h = u.nameParts.head
        if (tAlias.exists(h.equalsIgnoreCase))
          UnresolvedAttribute("t" +: u.nameParts.tail)
        else if (sAlias.exists(h.equalsIgnoreCase))
          UnresolvedAttribute("s" +: u.nameParts.tail)
        else u
    }

  private def attrName(e: Expression): String = e match {
    case u: UnresolvedAttribute if u.nameParts.length == 1 => u.nameParts.head
    case other => throw new IllegalArgumentException(
      s"UPDATE SET supports plain column names, got: ${other.sql}")
  }

  private def translateMerge(dir: String, m: MergeIntoTable): GraftMergeCommand = {
    val tAlias = aliasOf(m.targetTable)
    val sAlias = aliasOf(m.sourceTable)
    def csql(c: Option[Expression]): String =
      c.map(e => remapAliases(e, tAlias, sAlias).sql).getOrElse("true")

    // ON: conjunction of t.k = s.k equalities → the engine's key columns
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyCols = conjuncts(m.mergeCondition).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
        l.nameParts.last
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake: the ON clause must be a conjunction of " +
          s"t.key = s.key equalities (the engine merges by key); got: ${other.sql}")
    }

    // matched pair with SQL clause-order semantics (first match wins)
    var updateWhen: Option[String] = None
    var deleteWhen: Option[String] = None
    m.matchedActions match {
      case Seq() =>
      case Seq(UpdateStarAction(c)) => updateWhen = Some(csql(c))
      case Seq(DeleteAction(c)) => deleteWhen = Some(csql(c))
      case Seq(DeleteAction(dc), UpdateStarAction(uc)) =>
        // engine evaluates delete before update — same order as SQL here
        deleteWhen = Some(csql(dc)); updateWhen = Some(csql(uc))
      case Seq(UpdateStarAction(uc), DeleteAction(dc)) =>
        // SQL fires the FIRST matching clause: guard the later delete
        updateWhen = Some(csql(uc))
        deleteWhen = Some(
          s"(${csql(dc)}) AND NOT coalesce((${csql(uc)}), false)")
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake supports WHEN MATCHED THEN UPDATE SET * " +
          "and WHEN MATCHED THEN DELETE (at most one of each); got: " +
          other.map(_.getClass.getSimpleName).mkString(", "))
    }
    val insertWhen = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertStarAction(c)) => Some(csql(c))
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake supports WHEN NOT MATCHED THEN INSERT * " +
          "only; got: " + other.map(_.getClass.getSimpleName).mkString(", "))
    }
    val nmbsDelete = m.notMatchedBySourceActions match {
      case Seq() => None
      case Seq(DeleteAction(c)) => Some(csql(c))
      case other => throw new IllegalArgumentException(
        "MERGE INTO graft_lake supports WHEN NOT MATCHED BY SOURCE THEN " +
          "DELETE only; got: " +
          other.map(_.getClass.getSimpleName).mkString(", "))
    }
    GraftMergeCommand(dir, m.sourceTable, keyCols, updateWhen, deleteWhen,
      insertWhen, nmbsDelete)
  }

  private[sources] def dmlOutput: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)())

  private[sources] def singlePartCol(spark: SparkSession, dir: String): String = {
    val s = CommitLog.latest(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir has no commit log"))
    CommitLog.partColsOf(s) match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"MERGE INTO graft_lake('$dir') needs a single-column hive " +
          s"partitioning (the merge conflict unit); table has: " +
          (if (other.isEmpty) "none" else other.mkString(", ")))
    }
  }
}

/** `DELETE FROM graft_lake('dir') WHERE cond [USING DELETION VECTORS]` —
  * copy-on-write [[CommitLog.delete]], or the merge-on-read
  * [[CommitLog.deleteVectors]] with the suffix. */
case class GraftDeleteCommand(dir: String, condSql: String, mor: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val snap =
      if (mor) CommitLog.deleteVectors(spark, dir, expr(condSql))
      else CommitLog.delete(spark, dir, expr(condSql))
    Seq(Row(snap.version, snap.op))
  }
}

/** `UPDATE graft_lake('dir') SET c = e, ... [WHERE cond]` — one atomic
  * [[CommitLog.replaceWhere]] commit: the matching rows are deleted and
  * re-inserted with the assignments applied (values cast to the
  * column's committed type, as SQL UPDATE requires). File-granularity
  * copy-on-write with the standard rebase rules. */
case class GraftUpdateCommand(dir: String,
    assignments: Seq[(String, String)], condSql: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val base = CommitLog.read(spark, dir)
    val cond = condSql.map(expr).getOrElse(org.apache.spark.sql.functions.lit(true))
    val schema = base.schema
    assignments.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"UPDATE graft_lake('$dir'): no column $c in the committed schema")
    }
    val updated = assignments.foldLeft(
      base.filter(org.apache.spark.sql.functions.coalesce(
        cond, org.apache.spark.sql.functions.lit(false)))) {
      case (df, (c, vSql)) =>
        df.withColumn(c, expr(vSql).cast(schema(c).dataType))
    }
    val snap = CommitLog.replaceWhere(spark, dir, cond, updated)
    Seq(Row(snap.version, snap.op))
  }
}

/** `MERGE INTO graft_lake('dir') … ` — [[CommitLog.merge]] with the
  * parsed clause family. The source query analyzes at run time against
  * the session catalog (temp views, TVFs — including other graft
  * lakes). */
case class GraftMergeCommand(dir: String, sourcePlan: LogicalPlan,
    keyCols: Seq[String], updateWhen: Option[String],
    deleteWhen: Option[String], insertWhen: Option[String],
    notMatchedBySourceDeleteWhen: Option[String])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val source =
      org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, sourcePlan)
    val snap = CommitLog.merge(spark, dir, source, keyCols,
      LakeSqlDml.singlePartCol(spark, dir),
      updateWhen = updateWhen, deleteWhen = deleteWhen,
      insertWhen = insertWhen,
      notMatchedBySourceDeleteWhen = notMatchedBySourceDeleteWhen)
    Seq(Row(snap.version, snap.op))
  }
}

/** The injected [[ParserInterface]]: lake DML and time-travel sugar are
  * peeled off the statement text; everything else — including every
  * non-DML statement and every expression/identifier parse — delegates
  * verbatim to Spark's parser. */
class LakeSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan = {
    val sugared = LakeSqlDml.rewriteTimeTravel(sqlText)
    LakeSqlDml.parseDml(delegate, sugared)
      .getOrElse(delegate.parsePlan(sugared))
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(LakeSqlDml.rewriteTimeTravel(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}
