package graft.jobs

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RadarOps

/** E1/E3 — the download drivers (scrape.py, backload_scrape.py),
  * re-expressed as a distributed fetch stage:
  *
  *   task matrix (equipment × dates, J4) → anti-join against the ledger
  *   (J1 — never re-fetch loaded pairs) → executor-parallel fetch through
  *   the [[Fetcher]] connector → raw payloads to the landing prefix (S8)
  *   → per-task status log (S10) as a DataFrame.
  *
  * The HTTP client itself (scrape.py:54-56,63-72 session + GET) is an I/O
  * connector, not a relational op — it lives behind the Fetcher trait so
  * jobs/tests inject stubs and the engine stays hermetic. One task = one
  * (equipment, date) file: the fetch stage partitions perfectly across
  * executors, vs the reference's sequential per-file loop.
  */
object ScrapeJob {

  /** S1 connector boundary. Implementations must be Serializable (they
    * ship to executors). */
  trait Fetcher extends Serializable {
    /** Returns the raw report payload or a failure message. */
    def fetch(equipment: String, date: Date): Either[String, Array[Byte]]
  }

  /** S10 run-report row (scrape.py:75-78,90-111). */
  final case class FetchLogEntry(
      equipment: String,
      pubdate: Date,
      status: String,   // downloaded | failed
      error: String)

  /** Fetch every task surviving the ledger anti-join; payloads land as
    * `landingDir/EQUIP/yyyy-MM-dd.xlsx` (the reference's S3 key layout,
    * scrape.py:87). Returns the per-task log, MATERIALIZED (cached +
    * counted): evaluating this frame performs the HTTP fetches and file
    * writes, so a lazy return would re-download every payload on each
    * downstream action and could log a different outcome than what
    * actually landed. Callers unpersist when done. */
  def run(
      spark: SparkSession,
      fetcher: Fetcher,
      equipments: DataFrame,
      start: String,
      end: String,
      lake: IngestJob.Lake,
      landingDir: String): DataFrame = {
    import spark.implicits._
    // the planning stage IS backfillTasks — one definition (J4 + J1)
    val tasks = IngestJob.backfillTasks(spark, lake, equipments, start, end)
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)

    val log = tasks
      .select(col("equipment"), col("pubdate").cast("date").as("pubdate"))
      .as[(String, Date)]
      .mapPartitions { it =>
        it.map { case (equip, date) =>
          fetcher.fetch(equip, date) match {
            case Right(bytes) =>
              val key = s"$landingDir/$equip/$date.xlsx"
              try {
                val path = new org.apache.hadoop.fs.Path(key)
                val fs = path.getFileSystem(hadoopConf.value)
                val out = fs.create(path, true)
                try out.write(bytes) finally out.close()
                FetchLogEntry(equip, date, "downloaded", "")
              } catch {
                case e: Exception =>
                  FetchLogEntry(equip, date, "failed", s"store: ${e.getMessage}")
              }
            case Left(err) => FetchLogEntry(equip, date, "failed", err)
          }
        }
      }.toDF().cache()
    log.count() // force the single fetch pass NOW
    log
  }

  /** Persist the run report as JSON lines (S10's log_monitran_*.json). */
  def writeLog(log: DataFrame, logDir: String, runId: String): Unit =
    log.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$logDir/run_$runId")

  /** Full E1 nightly shape: fetch for one date, then drain the landing dir
    * through the E2 batch. */
  def nightly(
      spark: SparkSession,
      fetcher: Fetcher,
      equipments: DataFrame,
      date: String,
      lake: IngestJob.Lake,
      landingDir: String): (DataFrame, IngestJob.IngestReport) = {
    val log = run(spark, fetcher, equipments, date, date, lake, landingDir)
    val report = IngestJob.run(spark, landingDir, lake)
    (log, report)
  }
}
