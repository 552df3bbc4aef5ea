package graft.jobs

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.{ReportFixtures, Xlsx}

class ScrapeJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Stub portal: serves template-1 reports, fails for one equipment. */
  private object StubFetcher extends ScrapeJob.Fetcher {
    override def fetch(equipment: String, date: Date): Either[String, Array[Byte]] =
      if (equipment == "E_DOWN") Left("HTTP 500 from portal")
      else Right(Xlsx.write(ReportFixtures.workbook(1, equipment, date.toString)))
  }

  test("E1 nightly: fetch → land → ingest; failures logged not thrown") {
    val work = Files.createTempDirectory("scrape-spec").toString
    val lake = IngestJob.Lake(s"$work/lake")
    val equips = Seq("E1", "E2", "E_DOWN").toDF("equipment")

    val (log, report) = ScrapeJob.nightly(
      spark, StubFetcher, equips, "2021-03-01", lake, s"$work/landing")

    val statuses = log.select("equipment", "status")
      .as[(String, String)].collect().toMap
    assert(statuses == Map("E1" -> "downloaded", "E2" -> "downloaded",
      "E_DOWN" -> "failed"))
    assert(log.filter($"status" === "failed").select("error").as[String].head()
      .contains("HTTP 500"))
    assert(report.filesParsed == 2 && report.filesNew == 2)
    assert(report.flowRowsAppended == 2 * 96)

    // S10 log sink round-trips
    ScrapeJob.writeLog(log, s"$work/log", "20210302")
    assert(spark.read.json(s"$work/log/run_20210302").count() == 3)
  }

  test("second run anti-joins loaded pairs away (no refetch, no growth)") {
    val work = Files.createTempDirectory("scrape-spec2").toString
    val lake = IngestJob.Lake(s"$work/lake")
    val equips = Seq("E1", "E2").toDF("equipment")
    val (_, r1) = ScrapeJob.nightly(
      spark, StubFetcher, equips, "2021-03-01", lake, s"$work/landing")
    assert(r1.filesNew == 2)
    val log2 = ScrapeJob.run(
      spark, StubFetcher, equips, "2021-03-01", "2021-03-01", lake, s"$work/landing2")
    // both pairs already in the ledger → zero tasks survive the anti-join
    assert(log2.count() == 0)
    assert(!new java.io.File(s"$work/landing2").exists())
  }

  test("E3 backfill range: only missing (equipment, date) pairs fetched") {
    val work = Files.createTempDirectory("scrape-spec3").toString
    val lake = IngestJob.Lake(s"$work/lake")
    val equips = Seq("E1", "E2").toDF("equipment")
    ScrapeJob.nightly(spark, StubFetcher, equips, "2021-03-01", lake, s"$work/landing")
    val log = ScrapeJob.run(
      spark, StubFetcher, equips, "2021-03-01", "2021-03-03", lake, s"$work/landing")
    // 6 matrix pairs - 2 loaded = 4 fetched
    assert(log.count() == 4)
    assert(log.filter($"pubdate" === lit(Date.valueOf("2021-03-01"))).count() == 0)
  }
}
