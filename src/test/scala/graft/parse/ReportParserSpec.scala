package graft.parse

import org.scalatest.funsuite.AnyFunSuite



class ReportParserSpec extends AnyFunSuite {

  test("template 1: 96 rows, one direction, header fields extracted") {
    val parsed = ReportParser.parseGrid("t1", ReportFixtures.template1())
    val report = parsed.toOption.get
    assert(report.template == 1)
    assert(report.pubdate == "2021-03-05")
    assert(report.equipment == "FS551JOI")
    assert(report.rows.size == 96)
    assert(report.rows.forall(_.direction == "Centro/N"))
    assert(report.rows.head.time_range == "00:00 as 00:15")
    assert(report.rows.last.time_range == "23:45 as 00:00")
    val r0 = report.rows.head
    assert(Seq(r0.speed_00_10, r0.speed_11_20, r0.speed_21_30, r0.speed_31_40,
      r0.speed_41_50, r0.speed_51_60, r0.speed_61_70, r0.speed_71_80,
      r0.speed_81_90, r0.speed_91_100, r0.speed_100_up) == ReportFixtures.binsFor(0))
    assert(r0.total == ReportFixtures.binsFor(0).sum)
  }

  test("template 2: two 96-row direction blocks") {
    val report = ReportParser.parseGrid("t2", ReportFixtures.template2()).toOption.get
    assert(report.template == 2)
    assert(report.rows.size == 192)
    assert(report.rows.take(96).forall(_.direction == "Centro/N"))
    assert(report.rows.drop(96).forall(_.direction == "Centro/S"))
    // block 2 starts at sheet row 109 with slot offset 96 (wraps to 00:00)
    assert(report.rows(96).time_range == "00:00 as 00:15")
  }

  test("template 3: single 192-row block") {
    val report = ReportParser.parseGrid("t3", ReportFixtures.template3()).toOption.get
    assert(report.template == 3)
    assert(report.rows.size == 192)
    assert(report.rows.forall(_.direction == "Centro/L"))
  }

  test("sum(bins) == total invariant holds on all fixtures") {
    for (g <- Seq(ReportFixtures.template1(), ReportFixtures.template2(), ReportFixtures.template3())) {
      val rows = ReportParser.parseGrid("inv", g).toOption.get.rows
      rows.foreach { r =>
        val bins = Seq(r.speed_00_10, r.speed_11_20, r.speed_21_30, r.speed_31_40,
          r.speed_41_50, r.speed_51_60, r.speed_61_70, r.speed_71_80,
          r.speed_81_90, r.speed_91_100, r.speed_100_up)
        assert(bins.sum == r.total)
      }
    }
  }

  test("unknown layout yields ParseError, not a crash (clean_data.py:72-73)") {
    val res = ReportParser.parseGrid("bad", ReportFixtures.invalidTemplate())
    assert(res.isLeft)
    assert(res.left.toOption.get.message.contains("No template was found"))
  }

  test("missing header date yields ParseError") {
    val grid = CellGrid(ReportFixtures.template1().cells - ((2, 1)))
    val res = ReportParser.parseGrid("nodate", grid)
    assert(res.isLeft)
  }

  test("byte-level parse: xlsx write → ReportParser.parse") {
    val bytes = Xlsx.write(ReportFixtures.template2())
    val report = ReportParser.parse("bytes", bytes).toOption.get
    assert(report.rows.size == 192)
    assert(report.equipment == "FS551JOI")
  }

  test("garbage bytes yield ParseError") {
    assert(ReportParser.parse("junk", Array[Byte](0, 1, 2)).isLeft)
  }
}
