package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.{CatalogBridge, ColumnBridge}

import graft.sources.CommitLog

/** The analysis-time half of [[GraftCatalog]]: a [[GraftTable]] is pure
  * metadata, so this rule swaps its analyzed relation for the engine's
  * own plan before any capability check can ask for one.
  *
  *  - a READ of `graft.db.t` (plain, `VERSION AS OF`, `TIMESTAMP AS
  *    OF`) becomes the `CommitLog.read`/`readAt` snapshot plan — pruned
  *    file list, committed schema, DV filtering, rename mapping — with
  *    the relation's original exprIds preserved through an aliasing
  *    Project so every already-resolved reference upstream stays valid;
  *  - `INSERT INTO` / `df.writeTo(...).append()` ([[AppendData]])
  *    becomes a `CommitLog.append` commit;
  *  - `INSERT OVERWRITE` ([[OverwriteByExpression]] with a TRUE delete
  *    filter) becomes the atomic `CommitLog.overwrite` snapshot
  *    replace, and dynamic partition overwrite
  *    ([[OverwritePartitionsDynamic]]) the partition-granular
  *    `CommitLog.replacePartitions`;
  *  - `CREATE TABLE ... AS SELECT` becomes create + append in one
  *    command (non-atomic across the two commits, like every
  *    non-staging v2 catalog; the create is CAS-protected).
  *
  * DELETE/UPDATE/MERGE on catalog names never reach the analyzer — the
  * injected parser routes them to the same commands as the
  * `graft_lake()` TVF targets ([[graft.sources.LakeSqlDml]]). */
class ResolveGraftCatalogOps(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftTableOf(p: LogicalPlan): Option[GraftTable] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // spark.readStream.table("gcat.db.t"): the v2 table carries no
      // streaming capability, so REPLACE the relation with the engine's
      // V1 streaming source — the exact node readStream.format(
      // "graft-lake").load(dir) produces, before TableCapabilityCheck
      // can ask the pure-metadata table for a scan. Output attributes
      // are REUSED, so references bound to the v2 relation stay valid.
      case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if s.table.isInstanceOf[GraftTable] =>
        val t = s.table.asInstanceOf[GraftTable]
        require(t.pinnedVersion.isEmpty,
          s"cannot stream from time-travel pinned table ${t.name()}")
        import scala.jdk.CollectionConverters._
        org.apache.spark.sql.graftbridge.StreamBridge.v1StreamingRelation(
          session, classOf[graft.streaming.LakeSourceProvider].getName,
          "graft-lake",
          s.extraOptions.asScala.toMap + ("path" -> t.dir),
          t.schema(), s.output)

      case a: AppendData if graftTableOf(a.table).isDefined =>
        GraftTableWriteCommand(graftTableOf(a.table).get.dir, a.query,
          a.isByName, mode = "append")

      case o: OverwriteByExpression if graftTableOf(o.table).isDefined =>
        // deleteExpr TRUE = full snapshot replace; anything else is the
        // analyzer's static PARTITION spec (pd = 'x' [AND ...]) — the
        // exact shape of CommitLog.replaceWhere: delete the matching
        // rows and insert the batch in ONE atomic commit
        if (o.deleteExpr == Literal.TrueLiteral)
          GraftTableWriteCommand(graftTableOf(o.table).get.dir, o.query,
            o.isByName, mode = "overwrite")
        else {
          require(o.deleteExpr.resolved,
            "INSERT OVERWRITE PARTITION condition did not resolve")
          GraftTableWriteCommand(graftTableOf(o.table).get.dir, o.query,
            o.isByName, mode = "replace-where",
            condSql = Some(o.deleteExpr.sql))
        }

      case o: OverwritePartitionsDynamic
          if graftTableOf(o.table).isDefined =>
        GraftTableWriteCommand(graftTableOf(o.table).get.dir, o.query,
          o.isByName, mode = "replace-partitions")

      case t: TruncateTable if (t.table match {
            case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable =>
              r.table.isInstanceOf[GraftTable]
            case _ => false
          }) =>
        val r = t.table
          .asInstanceOf[org.apache.spark.sql.catalyst.analysis.ResolvedTable]
        GraftTruncateCommand(r.table.asInstanceOf[GraftTable].dir)

      case ctas: CreateTableAsSelect if (ctas.name match {
            case ResolvedIdentifier(_: GraftCatalog, _) => true
            case _ => false
          }) && ctas.query.resolved =>
        val ResolvedIdentifier(cat: GraftCatalog, ident) = ctas.name
        GraftCtasCommand(cat, ident, ctas.partitioning,
          ctas.tableSpec.properties, ctas.query, ctas.ignoreIfExists)

      case rtas: ReplaceTableAsSelect if (rtas.name match {
            case ResolvedIdentifier(_: GraftCatalog, _) => true
            case _ => false
          }) && rtas.query.resolved =>
        val ResolvedIdentifier(cat: GraftCatalog, ident) = rtas.name
        GraftRtasCommand(cat, ident, rtas.partitioning,
          rtas.tableSpec.properties, rtas.query, rtas.orCreate)

      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        val read = t.pinnedVersion match {
          case Some(v) => CommitLog.readAt(session, t.dir, v)
          case None => CommitLog.read(session, t.dir)
        }
        // tag the file relations with the table's catalog descriptor:
        // Catalog.refreshTable — which MicroBatchExecution calls after
        // every streaming-sink batch into this table — walks the
        // resolved plan and does `catalogTable.get` on every
        // LogicalRelation it finds; a bare path-read relation there
        // crashes the refresh with None.get
        val resolved = read.queryExecution.analyzed.transform {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation if lr.catalogTable.isEmpty =>
            lr.copy(catalogTable = Some(t.v1Table))
        }
        // keep the relation's exprIds: references bound to the v2
        // relation's attributes stay valid through this aliasing layer.
        // Match by NAME, not position — the parquet scan reorders hive
        // partition columns to the end of its output.
        Project(r.output.map { old =>
          val nw = resolved.output.find(_.name.equalsIgnoreCase(old.name))
            .getOrElse(throw new IllegalStateException(
              s"graft table ${t.name()} lost column '${old.name}' " +
                "between loadTable and scan — re-run the query"))
          Alias(nw, old.name)(exprId = old.exprId,
            qualifier = old.qualifier)
        }, resolved)
    }
}

/** INSERT INTO / INSERT OVERWRITE / dynamic partition overwrite landing
  * the corresponding [[CommitLog]] commit. `byName` follows SQL: an
  * INSERT binds by position, a `DataFrameWriterV2` append by name. */
case class GraftTableWriteCommand(dir: String, queryPlan: LogicalPlan,
    byName: Boolean, mode: String,
    condSql: Option[String] = None) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = graft.sources.LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val rows = ColumnBridge.ofRows(spark, queryPlan)
    val s = CommitLog.latest(spark, dir).getOrElse(
      throw new IllegalStateException(s"$dir has no commit log"))
    val (schema, partCols, _) = CommitLog.tableMeta(spark, dir, s)
    val aligned =
      if (byName) {
        val missing = schema.fieldNames.filterNot(rows.columns.contains)
        require(missing.isEmpty,
          s"write into $dir by name is missing column(s): " +
            missing.mkString(", "))
        // a misspelled/unexpected extra column must fail loudly, not
        // silently lose data through the select below (Delta/Spark v2
        // by-name writes reject unknown columns the same way)
        val extra = rows.columns.filterNot(c =>
          schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(extra.isEmpty,
          s"write into $dir by name carries column(s) not in the " +
            s"table schema: ${extra.mkString(", ")}")
        rows.select(schema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType)): _*)
      } else {
        require(rows.columns.length == schema.length,
          s"write into $dir needs ${schema.length} column(s) " +
            s"(${schema.fieldNames.mkString(", ")}); query has " +
            s"${rows.columns.length}")
        rows.toDF(schema.fieldNames.toIndexedSeq: _*)
          .select(schema.fields.toIndexedSeq.map(f =>
            col(f.name).cast(f.dataType)): _*)
      }
    val snap = mode match {
      case "append" => CommitLog.append(spark, aligned, dir)
      case "overwrite" =>
        CommitLog.overwrite(spark, aligned, dir, partCols)
      case "replace-where" =>
        CommitLog.replaceWhere(spark, dir,
          org.apache.spark.sql.functions.expr(condSql.get), aligned)
      case "replace-partitions" =>
        require(partCols.nonEmpty,
          s"dynamic partition overwrite needs hive partitioning; $dir " +
            "has none")
        // one row per TOUCHED partition tuple — bounded collect, capped
        // loudly (a query overwriting >10k partitions should use plain
        // INSERT OVERWRITE or replaceWhere instead of enumerating them)
        val cap = 10000
        val parts = aligned.select(partCols.map(col): _*).distinct()
          .limit(cap + 1).collect()
        require(parts.length <= cap,
          s"dynamic partition overwrite into $dir touches more than " +
            s"$cap partitions — use INSERT OVERWRITE (full) or " +
            "replaceWhere for rewrites this broad")
        CommitLog.replacePartitionTuples(spark, aligned, dir, partCols,
          parts.toSeq.map(r => partCols.indices.map(r.get)))
    }
    Seq(Row(snap.version, snap.op))
  }
}

/** `TRUNCATE TABLE graft.db.t` — one copy-on-write delete-everything
  * commit: the table empties under the committed schema, history stays
  * time-travelable, the rows wait for vacuum. */
case class GraftTruncateCommand(dir: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = graft.sources.LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = CommitLog.delete(spark, dir,
      org.apache.spark.sql.functions.lit(true))
    Seq(Row(snap.version, snap.op))
  }
}

/** CREATE TABLE ... AS SELECT — ATOMIC: the create commit and the data
  * append land in a writer-private `_`-prefixed STAGING directory
  * beside the table (invisible to listings and name resolution), then
  * one filesystem rename publishes the fully-formed table. A crash or
  * query failure anywhere before the rename leaves NO table — the
  * staging dir is deleted on failure (or swept as `_`-garbage after a
  * hard crash); a lost name race surfaces as TableAlreadyExists with
  * nothing published. This realizes the intent of Spark's
  * `StagingTableCatalog` directly: the engine's tables carry no v2
  * write capability, so the staged-write interface would be dead
  * weight — this command IS the whole CTAS path. */
/** `[CREATE OR] REPLACE TABLE ... AS SELECT` — Delta's semantics, not
  * drop-and-recreate: when the table EXISTS the replacement lands as
  * ONE atomic overwrite commit on the SAME commit log, so the
  * pre-replace versions stay time-travelable (`VERSION AS OF`), tags
  * keep resolving, and a crash leaves either the old snapshot or the
  * new one — never a missing table. The schema, rows, and layout all
  * come from the query; declared PARTITIONED BY drives the rewrite's
  * hive layout. `REPLACE TABLE` (no OR CREATE) on a missing table
  * fails like SQL requires; `CREATE OR REPLACE` falls back to the
  * staged-CTAS create. New TBLPROPERTIES merge in a follow-up props
  * commit (two commits; the data replace itself is atomic). */
case class GraftRtasCommand(catalog: GraftCatalog, ident: Identifier,
    partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
    properties: Map[String, String], queryPlan: LogicalPlan,
    orCreate: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = graft.sources.LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.tableExists(ident)) {
      if (!orCreate)
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident)
      return GraftCtasCommand(catalog, ident, partitioning, properties,
        queryPlan, ignoreIfExists = false).run(spark)
    }
    val rows = ColumnBridge.ofRows(spark, queryPlan)
    val dir = catalog.tableDirOf(ident)
    val partCols = partitioning.map(t => t.references().head.fieldNames()
      .mkString("."))
    partCols.foreach(p => require(rows.columns.contains(p),
      s"REPLACE TABLE $ident: partition column '$p' is not in the query"))
    val snap = CommitLog.replaceTable(spark, rows, dir, partCols)
    if (properties.nonEmpty) CommitLog.setProps(spark, dir, properties)
    Seq(Row(snap.version, snap.op))
  }
}

case class GraftCtasCommand(catalog: GraftCatalog, ident: Identifier,
    partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
    properties: Map[String, String], queryPlan: LogicalPlan,
    ignoreIfExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = graft.sources.LakeSqlDml.dmlOutput
  override def run(spark: SparkSession): Seq[Row] = {
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Seq(Row(-1L, "noop"))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    val rows = ColumnBridge.ofRows(spark, queryPlan)
    val dir = new org.apache.hadoop.fs.Path(catalog.tableDirOf(ident))
    val staging = new org.apache.hadoop.fs.Path(dir.getParent,
      s"_staging_ctas_${java.util.UUID.randomUUID.toString.take(8)}")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap =
      try {
        catalog.createStaged(ident, staging.toString,
          CatalogBridge.toV2Columns(rows.schema), partitioning, properties)
        CommitLog.append(spark, rows, staging.toString)
      } catch { case e: Throwable =>
        fs.delete(staging, true)
        throw e
      }
    // one atomic publish; a lost name race cleans up and reports.
    // Hadoop's local rename NESTS the source under an existing target
    // directory instead of failing — if a racing CTAS won the name
    // between the check and the rename, detect the nesting, remove it,
    // and report the race rather than claiming success over the
    // winner's data.
    val nested = new org.apache.hadoop.fs.Path(dir, staging.getName)
    def lostRace(): Seq[Row] = {
      fs.delete(staging, true)
      fs.delete(nested, true)
      if (ignoreIfExists) return Seq(Row(-1L, "noop"))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    if (catalog.tableExists(ident) || !fs.rename(staging, dir))
      return lostRace()
    if (fs.exists(nested)) return lostRace()
    Seq(Row(snap.version, snap.op))
  }
}
