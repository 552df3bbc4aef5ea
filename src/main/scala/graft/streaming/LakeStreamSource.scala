package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.CommitLog

/** STREAMING TABLE READ of a [[CommitLog]] lake — the idiomatic Spark
  * continuation of the reference's consume-once queue
  * (`/root/reference/src/clean_data.py:223-262`): instead of listing a
  * bucket and deleting consumed objects, a follower subscribes to the
  * table and receives each committed batch exactly once through the
  * streaming checkpoint.
  *
  * Offsets ARE commit versions (one long — the whole subscription
  * cursor is metadata-plane, no file listing anywhere):
  *
  *  - first batch = the table's full snapshot at subscription time
  *    (Delta's initial-snapshot contract), or nothing under
  *    `startingVersion=latest`, or history from `startingVersion=<v>`;
  *  - every later batch = the rows in files ADDED over the version
  *    range ([[CommitLog.addedRows]]) — append commits only;
  *    compactions are invisible; rewrites/deletes abort the stream
  *    loudly unless `skipChangeCommits=true` (Delta's option for
  *    streaming appends off a mutating table).
  *
  * Reachable three ways, all one machinery: `spark.readStream
  * .format("graft-lake").load(dirOrName)`, `spark.readStream
  * .table("gcat.db.t")` (the analyzer hangs this source off the
  * capability-less v2 table — [[graft.catalog.ResolveGraftCatalogOps]]),
  * and the path API. At 100 TB each poll reads one version file and
  * each batch reads exactly the appended files — the subscription
  * never scans the table; `maxFilesPerTrigger` bounds every
  * micro-batch (offsets are file-granular `(version, fileIndex)`
  * positions), so a 100 TB initial snapshot or a long backlog drains
  * in executor-sized steps instead of one table-sized batch. Admission
  * control rides [[SupportsAdmissionControl]] — the engine hands
  * `latestOffset` the start position every poll, so the source holds
  * NO cursor state and restarts are exact by construction. */
class LakeStreamSource(spark: SparkSession, dir: String,
    srcSchema: StructType, baseVersion: Option[Long],
    skipChangeCommits: Boolean,
    maxFilesPerTrigger: Option[Int] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  override def schema: StructType = srcSchema

  /** `Trigger.AvailableNow`: the run drains everything committed at
    * START time — in maxFilesPerTrigger-bounded batches, because this
    * interface keeps the engine calling [[latestOffset]] per batch
    * instead of jumping to one pre-captured table-sized batch — then
    * terminates. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = CommitLog.latest(spark, dir).map(_.version)

  /** File-granular stream position: everything through version `v`'s
    * first `i` pending files is delivered (`i = Int.MaxValue` ⇒ all of
    * `v`). `snap` marks that version `v`'s pending list is the FULL
    * SNAPSHOT file list (the initial-snapshot version) rather than the
    * per-commit additions — it rides the offset json because a
    * restarted source cannot re-derive the original subscription
    * version (the table has moved on), and misreading a later commit
    * as "the snapshot" would re-deliver the whole table. The
    * plain-long wire form is kept for version-boundary positions, so
    * existing checkpoints keep resolving. */
  private case class Pos(v: Long, i: Int, snap: Boolean) extends Offset {
    override def json: String =
      if (i == Int.MaxValue && !snap) v.toString
      else s"""{"v":$v,"i":$i${if (snap) ""","snap":true""" else ""}}"""
  }
  private object Pos {
    private val J =
      """\{\s*"v"\s*:\s*(\d+)\s*,\s*"i"\s*:\s*(\d+)\s*(,\s*"snap"\s*:\s*true\s*)?\}""".r
    def of(o: Offset): Pos = o match {
      case p: Pos => p
      case l: LongOffset => Pos(l.offset, Int.MaxValue, snap = false)
      case other => other.json.trim match {
        case J(v, i, s) => Pos(v.toLong, i.toInt, snap = s != null)
        case plain => Pos(plain.toLong, Int.MaxValue, snap = false)
      }
    }
  }

  /** Files version `v` contributes to the stream: the full snapshot at
    * the subscription version in initial-snapshot mode, the per-commit
    * additions afterwards. Metadata-plane; memoized (a version's list
    * is immutable). */
  private val pendingCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Boolean), Seq[String]]()
  private def pending(v: Long, snapshotAtV: Boolean): Seq[String] =
    pendingCache.computeIfAbsent((v, snapshotAtV), _ =>
      try {
        if (snapshotAtV) CommitLog.filesAt(spark, dir, v)
        else CommitLog.addedFilesAt(spark, dir, v, skipChangeCommits)
      } catch {
        case e: IllegalArgumentException
            if Option(e.getMessage).exists(_.contains("vacuumed")) =>
          // the follower fell behind a vacuum: the history it still
          // owes is gone — say exactly how to recover
          throw new IllegalStateException(
            s"streaming read of $dir: version $v was vacuumed under " +
              "the subscription — the stream fell behind the table's " +
              "retention; restart with a NEW checkpoint (fresh initial " +
              "snapshot) or raise vacuum keepLast above the follower lag",
            e)
      })

  /** The subscription version for a FRESH query (no checkpointed
    * offset): the latest version in initial-snapshot mode, the
    * requested base under `startingVersion`. A RESTARTED query never
    * consults this — the restored offset carries its own position and
    * snapshot flag ([[Pos]]). */
  private lazy val subV: Long = baseVersion.getOrElse(
    CommitLog.latest(spark, dir).map(_.version).getOrElse(
      throw new IllegalStateException(s"$dir has no commit log")))

  /** The walk's origin when the engine has no prior offset: the whole
    * snapshot in initial-snapshot mode, nothing of `subV` itself under
    * `startingVersion`. */
  private def origin: Pos =
    if (baseVersion.isEmpty) Pos(subV, 0, snap = true)
    else Pos(subV, Int.MaxValue, snap = false)

  /** Admission control: the ENGINE hands the start position in on
    * every poll (last available offset, checkpoint-restored after a
    * restart), so the source is stateless and restart-exact. */
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    import org.apache.spark.sql.connector.read.streaming.ReadMaxFiles
    val latest0 = CommitLog.latest(spark, dir).map(_.version)
      .getOrElse(return null)
    val latest = availableNowCap.fold(latest0)(math.min(latest0, _))
    val start = Option(startOffset).map(o =>
      Pos.of(o.asInstanceOf[Offset])).getOrElse(origin)
    // only the start position's version can be the snapshot list; every
    // later version contributes its per-commit additions
    def snapAt(v: Long): Boolean = v == start.v && start.snap
    limit match {
      case m: ReadMaxFiles =>
        // walk the pending lists forward from `start`, at most
        // maxFiles() files — the initial snapshot and any backlog drain
        // in bounded micro-batches instead of one table-sized batch
        var v = start.v
        var i = start.i
        var budget = m.maxFiles()
        var moved = false
        var done = false
        while (!done && budget > 0 && v <= latest) {
          val pend = pending(v, snapAt(v)).size
          val cur = if (i == Int.MaxValue) pend else math.min(i, pend)
          if (cur < pend) {
            val take = math.min(budget, pend - cur)
            i = cur + take; budget -= take; moved = true
            if (i == pend) i = Int.MaxValue
          } else if (v < latest) { v += 1; i = 0 }
          else done = true
        }
        if (moved) Pos(v, i, snapAt(v)) else startOffset
      case _ =>
        if (latest < start.v ||
          (start.v == latest && start.i == Int.MaxValue)) startOffset
        else Pos(latest, Int.MaxValue, snapAt(latest))
    }
  }

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "LakeStreamSource rides SupportsAdmissionControl — latestOffset")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = Pos.of(end)
    val s0 = start.map(Pos.of).getOrElse(origin)
    def snapAt(v: Long): Boolean = v == s0.v && s0.snap
    // files in (s0, e]: the rest of s0.v's pending list, whole versions
    // between, e.v's prefix — paired with the version whose schema/DV
    // view reads them (initial-snapshot files keep their DV filter;
    // per-commit additions are append-only by policy)
    def slice(v: Long, from: Int, until: Int): Seq[String] = {
      val p = pending(v, snapAt(v))
      val f = if (from == Int.MaxValue) p.size else math.min(from, p.size)
      val u = if (until == Int.MaxValue) p.size else math.min(until, p.size)
      p.slice(f, u)
    }
    val byVersion: Seq[(Long, Seq[String])] =
      if (e.v < s0.v) Nil // reposition replay against a fresher origin
      else if (s0.v == e.v) Seq(e.v -> slice(e.v, s0.i, e.i))
      else (s0.v -> slice(s0.v, s0.i, Int.MaxValue)) +:
        ((s0.v + 1) until e.v).map(v => v -> slice(v, 0, Int.MaxValue)) :+
        (e.v -> slice(e.v, 0, e.i))
    val parts = byVersion.filter(_._2.nonEmpty).map { case (v, files) =>
      CommitLog.readRelFiles(spark, dir, v, files, applyDvs = snapAt(v))
    }
    val df =
      if (parts.isEmpty)
        CommitLog.readRelFiles(spark, dir, e.v, Nil, applyDvs = false)
      else parts.reduce(_ unionByName _)
    // schema evolution mid-stream: the committed shape no longer matches
    // the subscription's — fail loudly; a restart picks up the new
    // schema (the Delta contract)
    require(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      srcSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"streaming read of $dir: the table schema changed under the " +
        s"subscription (${srcSchema.simpleString} -> " +
        s"${df.schema.simpleString}) — restart the stream to pick it up")
    StreamBridge.asStreaming(df)
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$dir]"
}

/** ROW-LEVEL CDC as a stream: `option("readChangeFeed", "true")` turns
  * the subscription into [[CommitLog.changeFeed]] batches —
  * `_change_type`-labeled inserts / deletes / update pre+post pairs per
  * observed version range — instead of append post-images. Offsets are
  * commit versions; the feed starts at the subscription version
  * (bootstrap the initial state with a snapshot read first, like
  * [[LakeFollow.followCdf]]) or at `startingVersion`. Requires
  * `keyColumns` (comma-separated) — the identity the update pairs key
  * on. Each batch reads only the range's churn, never the lake. */
class LakeCdfStreamSource(spark: SparkSession, dir: String,
    srcSchema: StructType, keyCols: Seq[String], baseVersion: Long)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  override def schema: StructType = srcSchema

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val latest = CommitLog.latest(spark, dir).map(_.version)
      .getOrElse(return null)
    val from = Option(startOffset)
      .map(o => versionOf(o.asInstanceOf[Offset])).getOrElse(baseVersion)
    if (latest <= from) startOffset else LongOffset(latest)
  }

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "LakeCdfStreamSource rides SupportsAdmissionControl — latestOffset")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = versionOf(end)
    val fromV = start.map(o => versionOf(o)).getOrElse(baseVersion)
    val df =
      if (toV <= fromV)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          srcSchema)
      else CommitLog.changeFeed(spark, dir, fromV, toV, keyCols)
    require(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      srcSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"streaming change feed of $dir: the table schema changed under " +
        s"the subscription (${srcSchema.simpleString} -> " +
        s"${df.schema.simpleString}) — restart the stream to pick it up")
    StreamBridge.asStreaming(df)
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeCdfStreamSource[$dir]"
}

/** `format("graft-lake")` registration: `.load()` takes a lake
  * directory OR a `cat.db.t` graft-catalog name (resolved through
  * [[graft.catalog.GraftCatalog.resolveTarget]]). Options:
  * `startingVersion` = `latest` | `<version>` (default: initial
  * snapshot first), `skipChangeCommits` = true|false,
  * `maxFilesPerTrigger` = bounded micro-batches, and
  * `readChangeFeed` = true with `keyColumns` = `k1[,k2...]` for the
  * row-level CDC stream ([[LakeCdfStreamSource]]). */
class LakeSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def dirOf(spark: SparkSession,
      parameters: Map[String, String]): String = {
    val target = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-lake stream source needs .load(<lake dir or cat.db.t>)"))
    graft.catalog.GraftCatalog.resolveTarget(spark, target)
  }

  private def committedSchema(spark: SparkSession, dir: String)
      : (StructType, Long) = {
    val snap = CommitLog.latest(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"$dir has no commit log — streaming reads need a graft table"))
    val (schema, partCols, _) = CommitLog.tableMeta(spark, dir, snap)
    // declared order must match what every batch read returns: the
    // parquet scan surfaces hive partition columns LAST
    val (partF, dataF) = schema.fields.partition(f =>
      partCols.contains(f.name))
    (StructType(dataF ++ partF), snap.version)
  }

  private def isCdf(parameters: Map[String, String]): Boolean =
    parameters.exists { case (k, v) =>
      k.equalsIgnoreCase("readChangeFeed") && v.toBoolean
    }

  private def cdfSchema(table: StructType): StructType =
    StructType(table.fields :+ org.apache.spark.sql.types.StructField(
      "_change_type", org.apache.spark.sql.types.StringType))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val dir = dirOf(ctx.sparkSession, parameters)
    val committed = committedSchema(ctx.sparkSession, dir)._1
    (s"graft-lake[$dir]", schema.getOrElse(
      if (isCdf(parameters)) cdfSchema(committed) else committed))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = ctx.sparkSession
    val dir = dirOf(spark, parameters)
    val (committed, latest) = committedSchema(spark, dir)
    val base = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("startingVersion") => v
    } match {
      case None => None // initial snapshot as the first batch
      case Some(v) if v.equalsIgnoreCase("latest") => Some(latest)
      case Some(v) => Some(v.toLong)
    }
    if (isCdf(parameters)) {
      val keys = parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("keyColumns") =>
          v.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      }.getOrElse(Nil)
      require(keys.nonEmpty,
        "readChangeFeed needs option keyColumns (comma-separated) — " +
          "the identity update pairs key on")
      new LakeCdfStreamSource(spark, dir,
        schema.getOrElse(cdfSchema(committed)), keys,
        base.getOrElse(latest))
    } else {
      val skip = parameters.exists { case (k, v) =>
        k.equalsIgnoreCase("skipChangeCommits") && v.toBoolean
      }
      val maxFiles = parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("maxFilesPerTrigger") => v.toInt
      }
      maxFiles.foreach(m => require(m > 0,
        s"maxFilesPerTrigger must be positive, got $m"))
      new LakeStreamSource(spark, dir, schema.getOrElse(committed), base,
        skip, maxFiles)
    }
  }
}
