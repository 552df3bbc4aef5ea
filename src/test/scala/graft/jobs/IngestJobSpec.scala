package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.{ReportFixtures, Xlsx}

class IngestJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def write(path: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
    ()
  }

  test("E2 end-to-end: parse → lake; idempotent re-run; errors as data") {
    val work = Files.createTempDirectory("ingest-spec").toString
    val landing = s"$work/landing"
    val lake = IngestJob.Lake(s"$work/lake")

    write(s"$landing/E1/2021-03-01.xlsx", Xlsx.write(ReportFixtures.workbook(1, "E1", "2021-03-01")))
    write(s"$landing/E2/2021-03-01.xlsx", Xlsx.write(ReportFixtures.workbook(2, "E2", "2021-03-01")))
    write(s"$landing/E1/2021-03-02.xlsx", Xlsx.write(ReportFixtures.workbook(3, "E1", "2021-03-02")))
    write(s"$landing/XX/2021-03-01.xlsx", Array[Byte](9, 9, 9))

    val r1 = IngestJob.run(spark, landing, lake)
    assert(r1.filesSeen == 4 && r1.filesParsed == 3 && r1.filesFailed == 1)
    assert(r1.filesNew == 3)
    assert(r1.flowRowsAppended == 96 + 192 + 192)

    val flows = IngestJob.readFlows(spark, lake)
    assert(flows.count() == 480)
    // lineage travels with every row
    assert(flows.filter(col("file_name").isNull || col("template").isNull).count() == 0)
    // histogram invariant survives the pipeline
    import graft.analytics.SpeedHistogram
    assert(flows.filter(SpeedHistogram.invariantViolated).count() == 0)
    // parse failure captured as data
    assert(spark.read.parquet(lake.errorsDir).count() == 1)

    val r2 = IngestJob.run(spark, landing, lake)
    assert(r2.filesNew == 0 && r2.flowRowsAppended == 0)
    assert(IngestJob.readFlows(spark, lake).count() == 480)
  }

  test("backfillTasks = task matrix minus loaded pairs") {
    val work = Files.createTempDirectory("ingest-spec2").toString
    val landing = s"$work/landing"
    val lake = IngestJob.Lake(s"$work/lake")
    write(s"$landing/E1/2021-03-01.xlsx", Xlsx.write(ReportFixtures.workbook(1, "E1", "2021-03-01")))
    IngestJob.run(spark, landing, lake)

    import spark.implicits._
    val todo = IngestJob.backfillTasks(spark, lake,
      Seq("E1", "E2").toDF("equipment"), "2021-03-01", "2021-03-02")
    val got = todo.select(date_format($"pubdate", "yyyy-MM-dd"), $"equipment")
      .as[(String, String)].collect().toSet
    assert(got == Set(("2021-03-01", "E2"), ("2021-03-02", "E1"), ("2021-03-02", "E2")))
  }

  test("archiveDir: parsed files move out of landing, failures stay (S11)") {
    val work = Files.createTempDirectory("ingest-spec3").toString
    val landing = s"$work/landing"
    val lake = IngestJob.Lake(s"$work/lake")
    write(s"$landing/E1/2021-03-01.xlsx", Xlsx.write(ReportFixtures.workbook(1, "E1", "2021-03-01")))
    write(s"$landing/XX/2021-03-01.xlsx", Array[Byte](9, 9, 9))

    val r = IngestJob.run(spark, landing, lake, archiveDir = Some(s"$work/archive"))
    assert(r.filesParsed == 1 && r.filesFailed == 1)
    assert(!new java.io.File(s"$landing/E1/2021-03-01.xlsx").exists())
    assert(new java.io.File(s"$work/archive/E1/2021-03-01.xlsx").exists())
    // the unparseable payload is retained for inspection
    assert(new java.io.File(s"$landing/XX/2021-03-01.xlsx").exists())
  }

  test("duplicate (pubdate, equipment) files in one batch: one winner, no doubled rows") {
    val work = Files.createTempDirectory("ingest-spec-dup").toString
    val landing = s"$work/landing"
    val lake = IngestJob.Lake(s"$work/lake")
    // same report uploaded twice under different paths (key comes from
    // cells INSIDE the file, not the path) — the reference's unique
    // index rejected the second copy; we must load exactly one
    write(s"$landing/E1/2021-03-01.xlsx",
      Xlsx.write(ReportFixtures.workbook(1, "E1", "2021-03-01")))
    write(s"$landing/E1-copy/2021-03-01.xlsx",
      Xlsx.write(ReportFixtures.workbook(1, "E1", "2021-03-01")))

    val r = IngestJob.run(spark, landing, lake)
    assert(r.filesParsed == 2 && r.filesNew == 1)
    assert(r.flowRowsAppended == 96, s"doubled rows: ${r.flowRowsAppended}")
    val flows = IngestJob.readFlows(spark, lake)
    assert(flows.count() == 96)
    // deterministic winner: minimum file_name, recorded consistently in
    // ledger AND carried on every flow row
    val ledger = IngestJob.readLedger(spark, lake)
    assert(ledger.count() == 1)
    val winner = ledger.select(col("file_name")).collect()(0).getString(0)
    // min file_name wins ("E1-copy" < "E1/" — '-' sorts before '/')
    assert(winner.contains("/E1-copy/"), s"expected min path to win, got $winner")
    assert(flows.select(col("file_name")).distinct().collect()(0).getString(0) == winner)
  }
}
