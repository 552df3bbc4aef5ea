package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned commit log for a parquet lake — ONE metadata mechanism
  * replacing the three uncoordinated sidecars that grew around the lake
  * (the streaming upsert's `_graft_commits` marker files, the zone-map
  * `_graft_manifest`, and compaction's rename swap), so a reader always
  * sees a complete pre- or post-commit snapshot and never a torn mix.
  * This is the lake-format answer to the reference's Postgres schema,
  * where the unique index + `equipment_files` ledger give writers
  * atomicity and readers consistency for free
  * (`/root/reference/database/schema.sql:22-33`).
  *
  * Design (single table, MVCC over immutable files):
  *  - Data files are IMMUTABLE and committing operations never delete
  *    them. `upsert` and `compact` write NEW files alongside the old
  *    (copy-on-write) and then publish a version file listing exactly
  *    the files that make up the new snapshot. Old versions stay
  *    readable ([[readAt]]) until [[vacuum]].
  *  - The version file `_graft_log/v<20-digit>.json` is the COMMIT
  *    POINT: it is created with create-no-overwrite (the filesystem's
  *    compare-and-swap), so two writers racing to the same version fail
  *    loudly on the second create — the single-writer contract is now
  *    ENFORCED, not just documented.
  *  - The version file carries everything that must change atomically
  *    with the data: the live file list, the set of committed streaming
  *    batch ids (the exactly-once ledger rides the commit — a replayed
  *    batch id is a no-op), and a per-version zone-map stats snapshot
  *    (`manifest`). Because the stats are pinned to the version they
  *    describe, the skipping-manifest STALENESS failure mode is gone by
  *    construction — [[scanBox]] needs no freshness check at all.
  *  - Readers resolve the latest version file and read exactly its file
  *    list (`basePath` keeps hive partition columns). An uncommitted
  *    data file (a crashed writer's residue) is invisible: it is on
  *    disk but in no version. A truncated/corrupt latest version file
  *    (crash mid-create) degrades to the previous version with a stderr
  *    warning — pre-state, never a torn mix.
  *
  * At 100 TB: the per-commit metadata is one row per file (the same
  * planning-scale footprint any table format carries); an upsert reads
  * and rewrites only the touched partitions' files (pruned via the
  * `key=value` path components of the file list, no directory listing);
  * vacuum cost is one listing plus unlink of dead files.
  *
  * Contract boundaries, stated loudly: the CAS relies on atomic
  * create-no-overwrite (HDFS/local semantics; an object store needs a
  * conditional-put equivalent), and [[vacuum]] breaks readers pinned to
  * the versions it drops — retain enough history for the longest query.
  */
object CommitLog {

  private val LogDirName = "_graft_log"
  private val DefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** One committed version: the live file list (dir-relative), the
    * committed streaming batch ids, and the zone-map stats snapshot
    * (relative path of a parquet directory under the log, if stats
    * columns were declared at [[init]]). */
  final case class Snapshot(
      version: Long, files: Seq[String], batches: Seq[Long],
      statsCols: Seq[String], manifest: Option[String])

  private def logPath(dir: String) = new Path(dir, LogDirName)
  private def versionFile(dir: String, v: Long) =
    new Path(logPath(dir), f"v$v%020d.json")
  private def hadoopFs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------- codec
  private def render(s: Snapshot): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(
      ("version" -> s.version) ~ ("files" -> s.files) ~
        ("batches" -> s.batches) ~ ("statsCols" -> s.statsCols) ~
        ("manifest" -> s.manifest)))
  }

  private def parse(text: String): Snapshot = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    Snapshot(
      (j \ "version").extract[Long],
      (j \ "files").extract[Seq[String]],
      (j \ "batches").extract[Seq[Long]],
      (j \ "statsCols").extract[Seq[String]],
      (j \ "manifest").extractOpt[String])
  }

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  /** The commit point: create-no-overwrite is the filesystem CAS — a
    * concurrent writer that raced to the same version number fails HERE,
    * loudly, with the log unchanged. */
  private def casWrite(f: FileSystem, p: Path, text: String): Unit = {
    val out =
      try f.create(p, false)
      catch { case _: java.io.IOException =>
        throw new IllegalStateException(
          s"commit conflict on $p — another writer (or a crashed run's " +
            "version file) holds this version; the commit log is single-writer")
      }
    try out.write(text.getBytes(UTF_8)) finally out.close()
  }

  // ----------------------------------------------------------- reading
  private val VersionName = "^v(\\d{20})\\.json$".r

  private def versionNumbers(f: FileSystem, dir: String): Seq[Long] = {
    val lp = logPath(dir)
    if (!f.exists(lp)) return Nil
    f.listStatus(lp).toSeq.flatMap(st => st.getPath.getName match {
      case VersionName(n) => Some(n.toLong)
      case _ => None
    }).sorted
  }

  /** Latest readable snapshot. A corrupt newest version file (a writer
    * crashed mid-create) falls back to the previous version with a
    * warning — the reader sees pre-commit state, never garbage. */
  def latest(spark: SparkSession, dir: String): Option[Snapshot] = {
    val f = hadoopFs(spark, dir)
    versionNumbers(f, dir).reverse.view.flatMap { v =>
      try Some(parse(readText(f, versionFile(dir, v))))
      catch { case e: Exception =>
        System.err.println(
          s"[commitlog] unreadable version $v in $dir (${e.getMessage}) — " +
            "falling back to the previous version")
        None
      }
    }.headOption
  }

  private def mustLatest(spark: SparkSession, dir: String): Snapshot =
    latest(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir has no commit log — CommitLog.init it first"))

  private def absolute(dir: String, rels: Seq[String]): Seq[String] =
    rels.map(r => s"$dir/$r")

  private def readSnapshot(spark: SparkSession, dir: String,
      s: Snapshot): DataFrame = {
    require(s.files.nonEmpty, s"version ${s.version} of $dir lists no files")
    spark.read.option("basePath", dir)
      .parquet(absolute(dir, s.files): _*)
  }

  /** The table at its latest committed version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readSnapshot(spark, dir, mustLatest(spark, dir))

  /** Time travel: the table exactly as version `v` committed it (works
    * until [[vacuum]] drops that version). */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val f = hadoopFs(spark, dir)
    val p = versionFile(dir, v)
    require(f.exists(p), s"version $v of $dir does not exist (vacuumed?)")
    readSnapshot(spark, dir, parse(readText(f, p)))
  }

  // ---------------------------------------------------------- writing
  /** Dir-relative paths of the current on-disk data files. */
  private def listRel(spark: SparkSession, dir: String): Set[String] = {
    val base = hadoopFs(spark, dir).makeQualified(new Path(dir))
      .toUri.getPath.stripSuffix("/") + "/"
    DataSkipping.dataFiles(spark, dir)
      .map(u => new Path(u).toUri.getPath.stripPrefix(base))
  }

  /** Zone-map stats for `rels`, keyed by RELATIVE path so manifest rows
    * join the snapshot's file list directly. */
  private def relStats(spark: SparkSession, dir: String, rels: Seq[String],
      cols: Seq[String]): DataFrame = {
    val base = hadoopFs(spark, dir).makeQualified(new Path(dir)).toUri.getPath
    DataSkipping.fileStats(spark, dir, absolute(dir, rels), cols)
      .withColumn("file", regexp_replace(col("file"),
        "^.*" + java.util.regex.Pattern.quote(base) + "/", ""))
  }

  /** Publish `files` (+ ledger + stats) as the next version. The stats
    * snapshot is incremental: rows for files carried over from the
    * previous version are reused; only `newRels` are scanned. */
  private def commit(spark: SparkSession, dir: String, prev: Snapshot,
      files: Seq[String], newRels: Seq[String],
      batches: Seq[Long]): Snapshot = {
    val f = hadoopFs(spark, dir)
    val v = prev.version + 1
    val manifestRel =
      if (prev.statsCols.isEmpty) None
      else {
        val rel = f"manifest-v$v%020d.parquet"
        val keptSet = files.toSet -- newRels
        val kept = prev.manifest.map { m =>
          spark.read.parquet(s"$dir/$LogDirName/$m")
            .filter(col("file").isInCollection(keptSet.toSeq))
        }
        val fresh =
          if (newRels.isEmpty) None
          else Some(relStats(spark, dir, newRels, prev.statsCols))
        val merged = (kept.toSeq ++ fresh).reduce(_ unionByName _)
        merged.coalesce(1).write.mode(SaveMode.ErrorIfExists)
          .parquet(s"$dir/$LogDirName/$rel")
        Some(rel)
      }
    val snap = Snapshot(v, files.sorted, batches.distinct.sorted,
      prev.statsCols, manifestRel)
    casWrite(f, versionFile(dir, v), render(snap))
    snap
  }

  /** Start the log: snapshot the directory's current files as version 1.
    * With `statsCols`, every subsequent commit also maintains the
    * zone-map stats snapshot for [[scanBox]]/[[scanRange]]. */
  def init(spark: SparkSession, dir: String,
      statsCols: Seq[String] = Nil): Snapshot = {
    val f = hadoopFs(spark, dir)
    require(versionNumbers(f, dir).isEmpty, s"$dir already has a commit log")
    f.mkdirs(logPath(dir))
    val rels = listRel(spark, dir).toSeq.sorted
    require(rels.nonEmpty, s"$dir holds no data files to snapshot")
    val seed = Snapshot(0L, Nil, Nil, statsCols, None)
    commit(spark, dir, seed, rels, rels, Nil)
  }

  /** Keyed copy-on-write upsert (same merge semantics as
    * [[Sources.upsertPartitioned]], including version-aware `seqCol`).
    * Reads ONLY the touched partitions' files — pruned via the
    * `key=value` components of the snapshot's file list, no directory
    * listing — writes the merged slice as new files, and commits. With
    * `batchId`, the commit doubles as the streaming exactly-once ledger:
    * an id already in the log makes the whole call a no-op, so an
    * at-least-once replay cannot double-apply. */
  def upsert(spark: SparkSession, updates: DataFrame, dir: String,
      keyCols: Seq[String], partitionCol: String,
      seqCol: Option[String] = None,
      batchId: Option[Long] = None): Snapshot = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val s = mustLatest(spark, dir)
    if (batchId.exists(s.batches.contains)) {
      System.err.println(
        s"[commitlog] batch ${batchId.get} already committed to $dir — replay skipped")
      return s
    }
    val parts = updates.select(col(partitionCol)).distinct().collect()
      .map(_.get(0)).toSeq // one value per touched partition — small
    val partDirs = parts.map {
      case null => s"$partitionCol=$DefaultPartition"
      case v => s"$partitionCol=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v.toString)
    }.toSet
    val (touched, kept) =
      s.files.partition(f => partDirs.exists(d => f.startsWith(d + "/")))
    val merged =
      if (touched.isEmpty) updates
      else Sources.mergeKeyed(
        spark.read.option("basePath", dir).parquet(absolute(dir, touched): _*),
        updates, keyCols, seqCol)
    val before = listRel(spark, dir)
    merged.write.partitionBy(partitionCol).mode(SaveMode.Append).parquet(dir)
    val newRels = (listRel(spark, dir) -- before).toSeq.sorted
    commit(spark, dir, s, kept ++ newRels, newRels, s.batches ++ batchId)
  }

  /** Copy-on-write compaction: rewrite the CURRENT snapshot to
    * `targetPartitions` files per partition set and commit. No rename
    * swap, no crash window — a crash before the commit leaves only
    * unreferenced files for [[vacuum]]. */
  def compact(spark: SparkSession, dir: String,
      targetPartitions: Int): Snapshot = {
    val s = mustLatest(spark, dir)
    val df = readSnapshot(spark, dir, s)
    // partition columns, recovered from the snapshot's own path shape
    val partCols = s.files.head.split('/').dropRight(1)
      .takeWhile(_.contains('=')).map(_.takeWhile(_ != '=')).toSeq
    val before = listRel(spark, dir)
    val writer =
      if (partCols.isEmpty) df.repartition(targetPartitions).write
      else df.repartition(targetPartitions, partCols.map(col): _*)
        .write.partitionBy(partCols: _*)
    writer.mode(SaveMode.Append).parquet(dir)
    val newRels = (listRel(spark, dir) -- before).toSeq.sorted
    commit(spark, dir, s, newRels, newRels, s.batches)
  }

  /** Zone-map-pruned box scan over the LATEST snapshot. No staleness
    * check exists because none is needed: the stats snapshot was
    * committed atomically with the file list it describes. Falls back to
    * the full snapshot scan only when the log tracks no stats or lacks a
    * bound column. */
  def scanBox(spark: SparkSession, dir: String,
      bounds: Seq[(String, Long, Long)]): (DataFrame, (Int, Int)) = {
    require(bounds.nonEmpty, "scanBox needs at least one bound")
    val s = mustLatest(spark, dir)
    val predicate = bounds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    def full = (readSnapshot(spark, dir, s).filter(predicate),
      (s.files.size, s.files.size))
    val needed = bounds.flatMap { case (c, _, _) => Seq(s"min_$c", s"max_$c") }
    s.manifest match {
      case None => full
      case Some(m) =>
        val manifest = spark.read.parquet(s"$dir/$LogDirName/$m")
        if (!needed.forall(manifest.columns.contains)) return full
        val rows = manifest.select(col("file") +: needed.map(col): _*).collect()
        val survivors = rows.filter { r =>
          bounds.zipWithIndex.forall { case ((_, lo, hi), i) =>
            val minIdx = 1 + 2 * i
            val maxIdx = 2 + 2 * i
            !r.isNullAt(minIdx) && !r.isNullAt(maxIdx) &&
              r.getAs[Number](maxIdx).doubleValue() >= lo &&
              r.getAs[Number](minIdx).doubleValue() <= hi
          }
        }.map(_.getString(0)).toSeq
        val df =
          if (survivors.isEmpty) readSnapshot(spark, dir, s).filter(predicate).limit(0)
          else spark.read.option("basePath", dir)
            .parquet(absolute(dir, survivors): _*).filter(predicate)
        (df, (survivors.size, s.files.size))
    }
  }

  def scanRange(spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): (DataFrame, (Int, Int)) =
    scanBox(spark, dir, Seq((c, lo, hi)))

  /** Drop all but the newest `keepLast` versions and delete every data
    * file, version file, and stats snapshot no kept version references.
    * Returns the deleted data files. Readers pinned to dropped versions
    * break — that is the documented MVCC retention trade. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, "vacuum must keep at least the latest version")
    val f = hadoopFs(spark, dir)
    val versions = versionNumbers(f, dir)
    val (dropV, keepV) = versions.splitAt(math.max(0, versions.size - keepLast))
    val keptSnaps = keepV.map(v => parse(readText(f, versionFile(dir, v))))
    val live = keptSnaps.flatMap(_.files).toSet
    val liveManifests = keptSnaps.flatMap(_.manifest).toSet
    val dead = (listRel(spark, dir) -- live).toSeq.sorted
    dead.foreach(r => f.delete(new Path(dir, r), false))
    dropV.foreach { v =>
      parse(readText(f, versionFile(dir, v))).manifest
        .filterNot(liveManifests.contains)
        .foreach(m => f.delete(new Path(logPath(dir), m), true))
      f.delete(versionFile(dir, v), false)
    }
    dead
  }
}
