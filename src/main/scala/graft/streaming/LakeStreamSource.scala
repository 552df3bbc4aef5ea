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
  * never scans the table. */
class LakeStreamSource(spark: SparkSession, dir: String,
    srcSchema: StructType, baseVersion: Option[Long],
    skipChangeCommits: Boolean) extends Source {

  override def schema: StructType = srcSchema

  /** Newest committed version — one version-file read per poll. */
  override def getOffset: Option[Offset] =
    CommitLog.latest(spark, dir).map(s => LongOffset(s.version))

  /** A restarted stream replays offsets from the checkpoint log as
    * opaque JSON — [[LongOffset]]'s json is its number. */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = versionOf(end)
    val df = start.map(versionOf).orElse(baseVersion) match {
      case Some(fromV) =>
        CommitLog.addedRows(spark, dir, fromV, toV, skipChangeCommits)
      case None => // initial snapshot at the first observed version
        CommitLog.readAt(spark, dir, toV)
    }
    StreamBridge.asStreaming(df)
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$dir]"
}

/** `format("graft-lake")` registration: `.load()` takes a lake
  * directory OR a `cat.db.t` graft-catalog name (resolved through
  * [[graft.catalog.GraftCatalog.resolveTarget]]). Options:
  * `startingVersion` = `latest` | `<version>` (default: initial
  * snapshot first), `skipChangeCommits` = true|false. */
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
    val (schema, _, _) = CommitLog.tableMeta(spark, dir, snap)
    (schema, snap.version)
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val dir = dirOf(ctx.sparkSession, parameters)
    (s"graft-lake[$dir]",
      schema.getOrElse(committedSchema(ctx.sparkSession, dir)._1))
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
    val skip = parameters.exists { case (k, v) =>
      k.equalsIgnoreCase("skipChangeCommits") && v.toBoolean
    }
    new LakeStreamSource(spark, dir, schema.getOrElse(committed), base, skip)
  }
}
