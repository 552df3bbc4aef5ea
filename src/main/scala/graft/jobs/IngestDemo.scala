package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.SpeedHistogram
import graft.ops.RadarOps
import graft.parse.{ReportFixtures, Xlsx}
import graft.streaming.StreamingIngest

/** End-to-end driver of the radar pipeline against generated fixtures —
  * the runnable surface for the E1/E2/E3 paths: landing dir of xlsx
  * payloads → batch ingest (idempotent re-run) → streaming ingest of
  * late files → analytics + completeness audit over the lake.
  *
  * Usage: runMain graft.jobs.IngestDemo [workDir]
  */
object IngestDemo {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft-ingest").toString)
    val landing = s"$work/landing"
    val lake = IngestJob.Lake(s"$work/lake")

    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- seed the landing dir: 3 equipments × 2 days, mixed templates,
    //     plus one corrupt payload and one unknown layout
    val equips = Seq("FS551JOI", "FS552JOI", "FS553JOI")
    val dates = Seq("2021-03-01", "2021-03-02")
    var i = 0
    for (e <- equips; d <- dates) {
      val tpl = (i % 3) + 1
      writeFile(s"$landing/$e/$d.xlsx",
        Xlsx.write(ReportFixtures.workbook(tpl, e, d)))
      i += 1
    }
    writeFile(s"$landing/JUNK/2021-03-01.xlsx", Array[Byte](1, 2, 3, 4))
    writeFile(s"$landing/BAD/2021-03-01.xlsx",
      Xlsx.write(ReportFixtures.invalidTemplate()))

    // --- E2 batch run
    val r1 = IngestJob.run(spark, landing, lake)
    println(s"[demo] first run : $r1")
    require(r1.filesSeen == 8 && r1.filesParsed == 6 && r1.filesFailed == 2,
      s"unexpected parse counts: $r1")
    require(r1.filesNew == 6, s"expected 6 new files, got $r1")

    // --- idempotency: re-run appends nothing
    val r2 = IngestJob.run(spark, landing, lake)
    println(s"[demo] second run: $r2")
    require(r2.filesNew == 0 && r2.flowRowsAppended == 0,
      s"re-run must be a no-op, got $r2")

    // --- late files drained by the STREAMING path (consume-once archive)
    writeFile(s"$landing/FS551JOI/2021-03-03.xlsx",
      Xlsx.write(ReportFixtures.workbook(2, "FS551JOI", "2021-03-03")))
    writeFile(s"$landing/FS552JOI/2021-03-03.xlsx",
      Xlsx.write(ReportFixtures.workbook(1, "FS552JOI", "2021-03-03")))
    val query = StreamingIngest.start(spark, landing, lake,
      s"$work/checkpoint", archiveDir = Some(s"$work/archive"))
    query.processAllAvailable()
    query.stop()

    val ledger = IngestJob.readLedger(spark, lake)
    val flows = IngestJob.readFlows(spark, lake)
    val nFiles = ledger.count()
    val nFlows = flows.count()
    println(s"[demo] lake: $nFiles files, $nFlows flow rows")
    require(nFiles == 8, s"expected 8 ledger files, got $nFiles")

    // --- analytics over the lake
    println("[demo] daily profile (mean + p85 speed):")
    SpeedHistogram.dailyProfile(flows)
      .select($"equipment", $"direction", $"pubdate",
        round($"mean_speed", 2).as("mean_speed"),
        round($"p85_speed", 2).as("p85_speed"), $"total")
      .orderBy($"equipment", $"pubdate", $"direction")
      .show(50, truncate = false)

    println("[demo] completeness audit (expected 3 radars/day over 01..04):")
    val audit = RadarOps.completenessAudit(
      ledger, lit("2021-03-01"), lit("2021-03-04"), equips.size)
    audit.orderBy("pubdate").show()
    val auditRows = audit.collect()
    require(auditRows.length == 2, // 03-03 has 2/3, 03-04 has 0/3
      s"expected 2 deficient dates, got ${auditRows.mkString(";")}")

    // --- E3: backfill planning for the gaps found above
    val equipDim = equips.toDF("equipment")
    val todo = IngestJob.backfillTasks(spark, lake, equipDim,
      "2021-03-01", "2021-03-04")
    println("[demo] backfill tasks (anti-joined against ledger):")
    todo.orderBy("pubdate", "equipment").show()
    require(todo.count() == 4, s"expected 4 backfill tasks, got ${todo.count()}")

    println("[demo] OK — batch + streaming ingest, analytics, audit, backfill all consistent")
    spark.stop()
  }

  private def writeFile(path: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
    ()
  }
}
