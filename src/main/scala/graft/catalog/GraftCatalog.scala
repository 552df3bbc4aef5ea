package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graftbridge.CatalogBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.CommitLog

/** A [[graft.sources.CommitLog]] lake as a DataSourceV2 catalog TABLE.
  *
  * Pure metadata: name, committed schema, hive partitioning, table
  * properties, and (for `VERSION AS OF` / `TIMESTAMP AS OF`) the pinned
  * version. It deliberately implements NO read/write capability — the
  * injected resolution rule ([[GraftCatalogRules]]) swaps the analyzed
  * relation for the engine's own snapshot read plan before capability
  * checks run, so every scan goes through the same pruned, DV-filtered,
  * schema-aligned path as `CommitLog.read`, and every write lands the
  * same MVCC commit as the Scala API. The reference's data model is
  * named catalog tables (`/root/reference/database/schema.sql:22-71`);
  * this class is what makes `graft.db.t` one of them. */
final class GraftTable(
    val dir: String,
    ident: Identifier,
    tableSchema: StructType,
    partCols: Seq[String],
    props: Map[String, String],
    val pinnedVersion: Option[Long],
    catName: Option[String] = None) extends Table
    with org.apache.spark.sql.graftbridge.V1FallbackBridge {

  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def columns(): Array[Column] =
    CatalogBridge.toV2Columns(tableSchema)
  override def partitioning(): Array[Transform] =
    partCols.map(c => org.apache.spark.sql.connector.expressions.Expressions
      .identity(c)).toArray
  override def properties(): util.Map[String, String] =
    (props + (TableCatalog.PROP_LOCATION -> dir)).asJava
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()

  /** V1 fallback descriptor — what routes `df.writeStream
    * .format("graft-lake").toTable("gcat.db.t")` to the engine's
    * exactly-once stream sink: `DataStreamWriter.toTable` sends a
    * [[V2TableWithV1Fallback]] through its v1 path, which starts the
    * provider's `createSink` at the table location (the Delta-table
    * routing shape). Batch reads/writes are untouched: the analyzer
    * consults the fallback only on streaming plans. */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    CatalogTable(
      // the CATALOG part matters: MicroBatchExecution refreshes the
      // table after every sink batch through this identifier
      identifier = TableIdentifier(ident.name,
        ident.namespace.lastOption, catName),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new Path(dir).toUri)),
      schema = tableSchema,
      provider = Some("graft-lake"),
      partitionColumnNames = partCols)
  }
}

/** The `graft` [[TableCatalog]]: every table is a [[CommitLog]] lake at
  * `<warehouse>/<namespace>/<table>`, every namespace a directory.
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE NAMESPACE graft.db
  *   CREATE TABLE graft.db.orders (o_orderkey BIGINT, ..., pd STRING)
  *     PARTITIONED BY (pd) TBLPROPERTIES ('graft.statscols' = 'o_orderkey')
  *   INSERT INTO graft.db.orders SELECT ...
  *   SELECT * FROM graft.db.orders VERSION AS OF 3
  *   ALTER TABLE graft.db.orders ADD COLUMNS (note STRING)
  *   DROP TABLE graft.db.orders
  * }}}
  *
  * All DDL is commit-log metadata: CREATE is a zero-file version-1
  * commit ([[CommitLog.create]]), ADD COLUMNS the schema-only commit,
  * properties a props commit — each one CAS-protected, so concurrent
  * DDL resolves exactly like concurrent writes. DROP and RENAME are
  * filesystem verbs on the table directory (the log travels with its
  * data). At 100 TB nothing here scales with data size — the catalog
  * never lists data files; it reads one version file per loadTable. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
    warehouse = warehouse.stripSuffix("/")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def checkPart(part: String): String = {
    require(part.nonEmpty && !part.contains("/") && part != ".." &&
      part != "." && !part.startsWith("_"),
      s"illegal catalog name part: '$part'")
    part
  }

  private def nsPath(ns: Array[String]): Path = {
    require(ns.nonEmpty, s"catalog $catalogName has no root-level tables" +
      " — use a namespace (graft.<db>.<table>)")
    new Path((warehouse +: ns.toSeq.map(checkPart)).mkString("/"))
  }

  /** Table directory for an identifier — the one name→path mapping,
    * shared with the SQL DML parser through [[GraftCatalog.tableDir]]. */
  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), checkPart(ident.name()))

  def tableDirOf(ident: Identifier): String = tablePath(ident).toString

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_graft_log"))

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") && // CTAS staging, log dirs
        isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    try isTableDir(tablePath(ident))
    catch { case _: IllegalArgumentException => false }

  private def load(ident: Identifier, pinned: Option[Long]): Table = {
    val dir = tableDirOf(ident)
    val snap = pinned match {
      case Some(v) => CommitLog.snapshotAt(spark, dir, v)
      case None => CommitLog.latest(spark, dir).getOrElse(
        throw new NoSuchTableException(ident))
    }
    val (schema, partCols, props) = CommitLog.tableMeta(spark, dir, snap)
    new GraftTable(dir, ident, schema, partCols, props, pinned,
      Some(catalogName))
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    load(ident, None)
  }

  /** `VERSION AS OF <v>` through Spark's native time-travel grammar —
    * a number pins that commit version; any other string resolves as a
    * TAG name through the lake's refs (`VERSION AS OF 'train_v3'`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v =
      if (version.nonEmpty && version.forall(_.isDigit)) version.toLong
      else graft.sources.LakeRefs.tagVersion(spark, tableDirOf(ident),
        version)
    load(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    load(ident, Some(
      CommitLog.versionAsOf(spark, tableDirOf(ident), timestamp / 1000L)))
  }

  /** The CREATE commit's metadata, shared by [[createTable]] and the
    * atomic-CTAS staging path ([[createStaged]]). */
  private def createMeta(columns: Array[Column], partitions: Seq[Transform],
      props: Map[String, String]): (StructType, Seq[String], Seq[String],
      Map[String, String]) = {
    val schema = CatalogBridge.toStructType(columns)
    val partCols = partitions.map {
      case t if t.name == "identity" =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new IllegalArgumentException(
        s"catalog $catalogName supports identity PARTITIONED BY columns " +
          s"only (hive layout); got: $other")
    }
    props.get(TableCatalog.PROP_LOCATION).foreach(_ =>
      throw new IllegalArgumentException(
        s"catalog $catalogName manages table locations under its " +
          "warehouse — external LOCATION is not supported"))
    val statsCols = props.get("graft.statscols")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
    val keep = props -- Seq(TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_TABLE_TYPE,
      "graft.statscols")
    (schema, partCols, statsCols, keep)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (!fs.exists(nsPath(ident.namespace())))
      throw new NoSuchNamespaceException(ident.namespace())
    val (schema, partCols, statsCols, keep) =
      createMeta(columns, partitions.toSeq, properties.asScala.toMap)
    CommitLog.create(spark, tableDirOf(ident), schema, partCols,
      statsCols, keep)
    load(ident, None)
  }

  /** [[createTable]]'s commit landed at a writer-private STAGING
    * directory instead of the table path — the first half of the atomic
    * CTAS ([[GraftCtasCommand]]: stage create + append, publish with
    * one rename). Validates the namespace and the target name, but
    * deliberately does NOT claim the name — the publish rename is the
    * single commit point. */
  def createStaged(ident: Identifier, stagingDir: String,
      columns: Array[Column], partitions: Seq[Transform],
      properties: Map[String, String]): Unit = {
    if (!fs.exists(nsPath(ident.namespace())))
      throw new NoSuchNamespaceException(ident.namespace())
    checkPart(ident.name())
    val (schema, partCols, statsCols, keep) =
      createMeta(columns, partitions, properties)
    CommitLog.create(spark, stagingDir, schema, partCols, statsCols, keep)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDirOf(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "ALTER TABLE ADD COLUMNS supports top-level columns only")
        require(add.isNullable,
          s"ALTER TABLE: '${add.fieldNames().head}' must be nullable — " +
            "existing rows have no value for it")
        CommitLog.addColumns(spark, dir, StructType(Seq(
          org.apache.spark.sql.types.StructField(add.fieldNames().head,
            add.dataType(), nullable = true))))
      case set: TableChange.SetProperty =>
        CommitLog.setProps(spark, dir, Map(set.property() -> set.value()))
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1,
          "ALTER TABLE RENAME COLUMN supports top-level columns only")
        CommitLog.renameColumn(spark, dir, rn.fieldNames().head, rn.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "ALTER TABLE DROP COLUMN supports top-level columns only")
        CommitLog.dropColumn(spark, dir, del.fieldNames().head)
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames().length == 1,
          "ALTER COLUMN TYPE supports top-level columns only")
        CommitLog.alterColumnType(spark, dir, ut.fieldNames().head,
          ut.newDataType())
      case other => throw new IllegalArgumentException(
        s"catalog $catalogName does not support table change " +
          s"${other.getClass.getSimpleName} — supported: ADD COLUMNS, " +
          "RENAME COLUMN, DROP COLUMN, ALTER COLUMN TYPE, " +
          "SET TBLPROPERTIES")
    }
    load(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    fs.delete(tablePath(ident), true)
  }

  /** `ALTER TABLE ... RENAME TO` may spell the new name with the
    * catalog prefix (`gcat.db.t`) — Spark hands it through verbatim, so
    * strip a leading namespace part that names THIS catalog. */
  private def normalize(ident: Identifier): Identifier =
    if (ident.namespace().length == 2 &&
      ident.namespace().head.equalsIgnoreCase(catalogName))
      Identifier.of(ident.namespace().drop(1), ident.name())
    else ident

  override def renameTable(oldIdent0: Identifier,
      newIdent0: Identifier): Unit = {
    val (oldIdent, newIdent) = (normalize(oldIdent0), normalize(newIdent0))
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!fs.exists(nsPath(newIdent.namespace())))
      throw new NoSuchNamespaceException(newIdent.namespace())
    require(fs.rename(tablePath(oldIdent), tablePath(newIdent)),
      s"rename ${oldIdent} -> ${newIdent} failed")
  }

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root)
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // one level deep
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fs.exists(nsPath(namespace)) &&
      !isTableDir(nsPath(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION ->
      nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1,
      s"catalog $catalogName supports one namespace level (graft.<db>)")
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"catalog $catalogName namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty " +
          "(use CASCADE)")
    fs.delete(nsPath(namespace), true)
  }
}

object GraftCatalog {

  /** Catalog names of the session that are configured to THIS plugin —
    * the SQL DML parser uses this to recognize `cat.db.t` targets. */
  def catalogNames(spark: SparkSession): Seq[String] = {
    val prefix = "spark.sql.catalog."
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith(prefix) && !k.stripPrefix(prefix)
        .contains('.') && v == classOf[GraftCatalog].getName =>
        k.stripPrefix(prefix)
    }.toSeq
  }

  /** `cat.ns.table` → lake directory, via the catalog's warehouse conf.
    * The parser-side twin of the catalog's own ident→path mapping. */
  def tableDir(spark: SparkSession, catalog: String,
      parts: Seq[String]): String = {
    val wh = spark.conf.getOption(s"spark.sql.catalog.$catalog.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"catalog $catalog has no warehouse configured"))
    require(parts.size == 2,
      s"graft catalog tables are $catalog.<db>.<table>; got " +
        (catalog +: parts).mkString("."))
    (wh.stripSuffix("/") +: parts).mkString("/")
  }

  private val QualifiedName =
    """^([A-Za-z_]\w*)\.([A-Za-z_]\w*)\.([A-Za-z_]\w*)(@[A-Za-z0-9][A-Za-z0-9_.-]*)?$""".r

  /** A lake target that may be EITHER a directory path or a
    * catalog-qualified `cat.db.t` name — the latter resolves through
    * the catalog's warehouse, so the TVFs (`graft_lake_history(...)`)
    * and CALL maintenance verbs (`CALL graft_compact('gcat.db.t', 4)`)
    * address catalog tables by name. Either form may carry an
    * `@<branch>` suffix addressing a zero-copy branch
    * ([[graft.sources.CommitLog.createBranch]]) — the suffix rides
    * through name resolution onto the resolved directory. A string
    * with a `/` (or no matching graft catalog) is a path, unchanged. */
  def resolveTarget(spark: SparkSession, target: String): String =
    target match {
      case QualifiedName(cat, db, t, branch)
          if catalogNames(spark).exists(_.equalsIgnoreCase(cat)) =>
        tableDir(spark, cat, Seq(db, t)) + Option(branch).getOrElse("")
      case p => p
    }
}
