package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

import graft.model.Model
import graft.parse.{ReportFixtures, ReportParser}

class RadarOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cleanDirection: split+anchored recode (clean_data.py:44-50)") {
    val df = Seq("Centro/N", "X/S", "A/L", "B/O", "C/Q", "NoSlash")
      .toDF("direction")
    val got = RadarOps.cleanDirection(df).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("Norte"), Some("Sul"), Some("Leste"), Some("Oeste"),
      Some("Q"), None))
  }

  test("cleanDirection splits on FIRST slash only (n=1 semantics)") {
    val got = RadarOps.cleanDirection(Seq("a/b/c").toDF("direction"))
      .as[String].collect().toSeq
    assert(got == Seq("b/c"))
  }

  test("splitTimeRange + slot seconds") {
    val df = RadarOps.withSlotSeconds(RadarOps.splitTimeRange(
      Seq("00:00 as 00:15", "23:45 as 00:00").toDF("time_range")))
    val got = df.select("initial_time", "end_time", "initial_seconds", "end_seconds")
      .as[(String, String, Int, Int)].collect().toSeq
    assert(got == Seq(("00:00", "00:15", 0, 900), ("23:45", "00:00", 85500, 0)))
  }

  test("fileKey / parseFileKey are inverses (scrape.py:87 / backload_scrape.py:82-86)") {
    val df = Seq(("FS551JOI", "2021-03-05")).toDF("equipment", "pubdate")
      .withColumn("pubdate", to_date($"pubdate"))
    val keyed = df.select(RadarOps.fileKey($"equipment", $"pubdate", "xlsx").as("file_name"))
    assert(keyed.as[String].head() == "FS551JOI/2021-03-05.xlsx")
    val back = RadarOps.parseFileKey(keyed)
      .select($"equipment", date_format($"pubdate", "yyyy-MM-dd"))
      .as[(String, String)].head()
    assert(back == ("FS551JOI", "2021-03-05"))
  }

  test("taskMatrix × antiJoinLoaded (backload_scrape.py:56-86)") {
    val equip = Seq("A", "B", "C").toDF("equipment")
    val tasks = RadarOps.taskMatrix(equip, lit("2021-03-01"), lit("2021-03-05"))
    assert(tasks.count() == 15)
    val ledger = Seq(("A", "2021-03-01"), ("B", "2021-03-02"), ("A", "2021-03-02"))
      .toDF("equipment", "pubdate")
      .withColumn("pubdate", to_date($"pubdate"))
    val todo = RadarOps.antiJoinLoaded(tasks, ledger)
    assert(todo.count() == 12)
    // loaded ∩ scheduled = ∅
    assert(todo.join(ledger, Seq("equipment", "pubdate"), "inner").count() == 0)
  }

  test("idempotentNewRows: second load adds nothing (clean_data.py:164-180)") {
    val existing = Seq(("A", "2021-03-01", 10)).toDF("equipment", "pubdate", "total")
    val incoming = Seq(("A", "2021-03-01", 10), ("A", "2021-03-02", 11),
      ("A", "2021-03-02", 11)).toDF("equipment", "pubdate", "total")
    val fresh = RadarOps.idempotentNewRows(incoming, existing, Seq("equipment", "pubdate"))
    assert(fresh.count() == 1)
    val afterAppend = existing.union(fresh)
    val second = RadarOps.idempotentNewRows(incoming, afterAppend, Seq("equipment", "pubdate"))
    assert(second.count() == 0)
  }

  test("completenessAudit reports deficient AND zero-file dates (verify_dates.py)") {
    val ledger = (Seq.fill(3)(("2021-03-01", "E")) ++ Seq.fill(1)(("2021-03-02", "E")))
      .zipWithIndex.map { case ((d, e), i) => (e + i, d) }
      .toDF("equipment", "pubdate")
      .withColumn("pubdate", to_date($"pubdate"))
    val audit = RadarOps.completenessAudit(ledger, lit("2021-03-01"), lit("2021-03-03"), 3)
      .orderBy("pubdate")
      .select(date_format($"pubdate", "yyyy-MM-dd"), $"files_found", $"files_missing")
      .as[(String, Long, Long)].collect().toSeq
    assert(audit == Seq(("2021-03-02", 1L, 2L), ("2021-03-03", 0L, 3L)))
  }

  test("loadEquipments: PT→EN rename, drops, 0/1→boolean (load_equipments.py)") {
    val raw = Seq((
      "FS551JOI", -26.3f, -48.8f, "Rua X", "Rua X alt", 1, 0, 1, 2, "S"))
      .toDF("equipamento", "latitude", "longitude", "endereco", "endereco_alterado",
        "ciclofaixa", "corredor", "estacionamento", "n_faixa_carro_sentido", "radar_2_sentidos")
    val dim = RadarOps.loadEquipments(raw)
    assert(dim.columns.toSet == Set("equipment", "latitude", "longitude", "address",
      "bike_lane", "bus_lane", "parking_lane", "number_lanes"))
    val row = dim.select("equipment", "bike_lane", "bus_lane", "parking_lane", "number_lanes")
      .as[(String, Boolean, Boolean, Boolean, Int)].head()
    assert(row == ("FS551JOI", true, false, true, 2))
  }

  test("normalizeFlows: parser output conforms to the 18-col flows schema") {
    val report = ReportParser.parseGrid("t2", ReportFixtures.template2()).toOption.get
    val raw = spark.createDataFrame(report.rows)
    val flows = RadarOps.normalizeFlows(raw)
    assert(flows.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Model.flowsSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val dirs = flows.select("direction").distinct().as[String].collect().toSet
    assert(dirs == Set("Norte", "Sul"))
    assert(flows.filter(RadarOps.directionValid($"direction")).count() == 192)
    assert(flows.filter($"pubdate" === to_date(lit("2021-03-05"))).count() == 192)
  }
}
