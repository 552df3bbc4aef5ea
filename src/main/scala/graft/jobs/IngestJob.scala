package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.Model
import graft.ops.RadarOps
import graft.parse.ReportParser

/** E2 — the reprocess-from-landing pipeline (clean_data.py `__main__`,
  * /root/reference/src/clean_data.py:217-262), re-expressed as one Spark
  * job instead of a per-file Python loop:
  *
  *   binaryFile scan of the landing prefix → executor-side parse
  *   (ReportParser inside map — one task per file, perfectly
  *   partitionable) → normalize → idempotent append to the parquet lake
  *   (flows + ledger), with parse failures collected as data, not crashes.
  *
  * Scale notes (100 TB design): the landing scan parallelizes over files;
  * parsing is embarrassingly parallel; the ledger guard is a broadcast
  * anti-join (ledger rows = files ever loaded — tiny next to flows); flows
  * land partitioned by pubdate so per-day queries prune; only run-report
  * counters ever reach the driver.
  */
object IngestJob {

  final case class IngestReport(
      filesSeen: Long,
      filesParsed: Long,
      filesFailed: Long,
      filesNew: Long,
      flowRowsAppended: Long)

  /** Lake layout under a root dir: flows + ledger + errors as parquet. */
  final case class Lake(root: String) {
    val flowsDir = s"$root/flows"
    val ledgerDir = s"$root/ledger"
    val errorsDir = s"$root/errors"
  }

  /** Flows-at-rest schema: the 18 clean columns + file lineage (the
    * engine's natural-key replacement for flows.equipment_files_id,
    * schema.sql:55). */
  val flowsLakeSchema: StructType = Model.flowsSchema
    .add("file_name", "string")
    .add("template", "integer")

  def readLedger(spark: SparkSession, lake: Lake): DataFrame =
    readOrEmpty(spark, lake.ledgerDir, Model.ledgerSchema)

  def readFlows(spark: SparkSession, lake: Lake): DataFrame =
    readOrEmpty(spark, lake.flowsDir, flowsLakeSchema)

  private def readOrEmpty(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Executor-side parse of a (path, content) DataFrame into
    * (reports, errors). Caller owns the returned frames' lifecycle —
    * cache them if consumed more than once. */
  def parseFiles(spark: SparkSession, files: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = files.select(col("path"), col("content"))
      .as[(String, Array[Byte])].map { case (path, bytes) =>
        ReportParser.parse(path, bytes) match {
          case Right(r) => (Some(r), Option.empty[Model.ParseError])
          case Left(e) => (Option.empty[Model.ParsedReport], Some(e))
        }
      }
    (parsed.flatMap(_._1).toDF(), parsed.flatMap(_._2).toDF())
  }

  /** Batch scan of every *.xlsx under `landingDir`. */
  def landingFiles(spark: SparkSession, landingDir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .option("recursiveFileLookup", "true")   // landing keys are EQUIP/date.xlsx
      .load(landingDir)
      .select(col("path"), col("content"))

  /** Run the full E2 batch. Idempotent: re-running over the same landing
    * dir appends nothing (J2 semantics on the (pubdate, equipment) natural
    * key, mirroring the unique index at schema.sql:31-33).
    *
    * `archiveDir`: consume-once semantics (S11, scrape.py:112-118 /
    * clean_data.py:256-262) — after a fully successful load, every
    * successfully PARSED landing file moves to the archive; parse
    * failures stay in the landing dir for inspection/retry, exactly like
    * the reference's delete-only-after-success rule. */
  def run(spark: SparkSession, landingDir: String, lake: Lake,
      archiveDir: Option[String] = None): IngestReport =
    runOnFilesAndArchive(spark, landingFiles(spark, landingDir), lake, archiveDir)

  /** Core batch + the parsed-only archival step — shared verbatim by the
    * batch driver and the streaming foreachBatch sink, so both honor the
    * same delete-only-after-success contract. */
  def runOnFilesAndArchive(spark: SparkSession, files: DataFrame, lake: Lake,
      archiveDir: Option[String]): IngestReport = {
    val (report, parsedSources, done) =
      runOnFilesWithSources(spark, files, lake)
    archiveDir.foreach { archive =>
      import spark.implicits._
      // ship the SESSION's Hadoop conf (credentials, defaultFS — the
      // ScrapeJob pattern); a bare `new Configuration()` would lose them
      val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      parsedSources.as[String].foreachPartition { (paths: Iterator[String]) =>
        paths.foreach { p =>
          // hadoop Path parses the stringified path directly (URI would
          // throw on unencoded spaces in file names)
          val src = new org.apache.hadoop.fs.Path(p)
          val fs = src.getFileSystem(hadoopConf.value)
          val rel = src.getParent.getName + "/" + src.getName
          val dst = new org.apache.hadoop.fs.Path(s"$archive/$rel")
          fs.mkdirs(dst.getParent)
          // rename returns false instead of throwing; the dest-exists
          // case (retried batch) means the file IS archived — drop the
          // landing copy so the dir still drains (consume-once)
          if (!fs.rename(src, dst)) {
            if (fs.exists(dst)) { fs.delete(src, false); () }
            else System.err.println(s"[ingest] archive move failed for $p")
          }
        }
      }
    }
    done()
    report
  }

  /** Core of E2 over an arbitrary (path, content) batch — shared by the
    * batch driver above and the Structured Streaming foreachBatch sink. */
  def runOnFiles(spark: SparkSession, files: DataFrame, lake: Lake): IngestReport = {
    val (report, _, done) = runOnFilesWithSources(spark, files, lake)
    done()
    report
  }

  /** As runOnFiles, also returning the successfully-parsed source paths
    * (the consume-once archival set) and a cleanup thunk the caller MUST
    * invoke once the sources frame is consumed (releases the parse
    * cache — leaking it once per streaming micro-batch would fill
    * executor storage memory). */
  private def runOnFilesWithSources(
      spark: SparkSession, files: DataFrame,
      lake: Lake): (IngestReport, DataFrame, () => Unit) = {
    val (reportsRaw, errors) = parseFiles(spark, files)
    val reports = reportsRaw.cache()
    val nParsed = reports.count()
    val nErr = errors.count()
    if (nErr > 0) {
      // append only errors for files not already recorded — failures
      // stay in the landing dir by design, and an unguarded append
      // would duplicate the same error row on every nightly re-run
      val existing = readOrEmpty(spark, lake.errorsDir,
        org.apache.spark.sql.Encoders.product[Model.ParseError].schema)
      errors.join(existing.select(col("source")), Seq("source"), "left_anti")
        .write.mode(SaveMode.Append).parquet(lake.errorsDir)
    }

    // Ledger candidates: one row per parsed file (clean_data.py:164-180).
    val candidates = reports.select(
      col("source").as("file_name"),
      to_date(col("pubdate")).as("pubdate"),
      col("equipment"),
      current_timestamp().as("date_created"))
    val newFiles = RadarOps
      .idempotentNewRows(candidates, readLedger(spark, lake), Seq("pubdate", "equipment"))
      .cache()
    val nNew = newFiles.count()

    var appended = 0L
    if (nNew > 0) {
      val tidy = reports
        .select(col("source").as("file_name"), col("template"), explode(col("rows")).as("r"))
        .select(col("file_name"), col("template"), col("r.*"))
      val cleaned = RadarOps.splitTimeRange(RadarOps.cleanDirection(
        tidy.withColumn("pubdate", to_date(col("pubdate")))))
      // filter by the WINNING FILE identity, not the (pubdate, equipment)
      // key: two same-key files in one batch would both pass a key-only
      // semi-join while the ledger records one — permanently doubling
      // that day's rows (the reference's unique index rejected this)
      val newFlows = cleaned
        .join(broadcast(newFiles.select("file_name")), Seq("file_name"), "left_semi")
        .select(flowsLakeSchema.fieldNames.map(col).toSeq: _*)
        .cache()
      appended = newFlows.count()
      newFlows.write.mode(SaveMode.Append).partitionBy("pubdate").parquet(lake.flowsDir)
      newFiles.write.mode(SaveMode.Append).parquet(lake.ledgerDir)
      newFlows.unpersist()
    }
    newFiles.unpersist()

    (IngestReport(
      filesSeen = nParsed + nErr,
      filesParsed = nParsed,
      filesFailed = nErr,
      filesNew = nNew,
      flowRowsAppended = appended),
      reports.select(col("source")),
      () => { reports.unpersist(); () })
  }

  /** E3 planning stage (backload_scrape.py:56-86): the (equipment × date
    * range) task matrix minus already-loaded pairs. The fetch itself is an
    * I/O connector (S1) — callers map the surviving tasks to downloads. */
  def backfillTasks(spark: SparkSession, lake: Lake, equipments: DataFrame,
      start: String, end: String): DataFrame =
    RadarOps.antiJoinLoaded(
      RadarOps.taskMatrix(equipments, lit(start), lit(end)),
      readLedger(spark, lake))
}
