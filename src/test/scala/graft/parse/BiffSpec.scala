package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

class BiffSpec extends AnyFunSuite {

  test("write → read round-trips strings, numbers, unicode, newlines") {
    val grid = CellGrid(Map(
      (0, 0) -> "hello",
      (2, 1) -> "Relatório 5/3/2021\nMonitran",
      (5, 1) -> "FS551JOI-Rua X",
      (3, 5) -> "42",
      (3, 7) -> "3.5",
      (4, 2) -> "-17",
      (7, 3) -> "2.10", // double round-trip would print "2.1" — must stay a string
      (8, 4) -> "数值",  // forces the UTF-16 string path
      (10, 2) -> "a<b&c>\"d\""))
    val back = Biff.read(Biff.write(grid))
    assert(back.cells == grid.cells)
    assert(back.nrows == 11)
  }

  test("randomized grids round-trip (numeric, fractional, text, unicode, empty)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 15) {
      val cells = (0 until 60).map { _ =>
        val v = rnd.nextInt(6) match {
          case 0 => rnd.nextInt(100000).toString
          case 1 => (rnd.nextDouble() * 1000 - 500).toString
          case 2 => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString
          case 3 => s"linha ${rnd.nextInt(99)}/ação\nsegunda"
          case 4 => ""
          case 5 => "0" + rnd.nextInt(100) // leading zero must stay text
        }
        ((rnd.nextInt(300), rnd.nextInt(30)), v)
      }.toMap
      val grid = CellGrid(cells)
      assert(Biff.read(Biff.write(grid)).cells == grid.cells)
    }
  }

  test("all three report templates parse identically through BIFF and XLSX") {
    for (t <- 1 to 3) {
      val grid = ReportFixtures.workbook(t, "FS551JOI", "2021-03-05")
      val viaXlsx = ReportParser.parse(s"x$t", Xlsx.write(grid))
      val viaBiff = ReportParser.parse(s"b$t", Biff.write(grid))
      assert(viaBiff.isRight, s"template $t failed via BIFF: $viaBiff")
      assert(viaBiff.map(r => (r.pubdate, r.equipment, r.template, r.rows)) ==
        viaXlsx.map(r => (r.pubdate, r.equipment, r.template, r.rows)),
        s"template $t BIFF/XLSX divergence")
    }
  }

  test("invalid template through BIFF yields the same ParseError path") {
    val res = ReportParser.parse("bad", Biff.write(ReportFixtures.invalidTemplate()))
    assert(res.isLeft)
    assert(res.left.toOption.get.message.contains("No template was found"))
  }

  // ---- hand-built record streams for the read-side surface our own
  // ---- writer never emits: SST/LABELSST with CONTINUE spans, RK, MULRK

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
  private def rec(t: Int, p: Array[Byte]) = le16(t) ++ le16(p.length) ++ p
  private def bof(dt: Int) =
    rec(0x0809, le16(0x0600) ++ le16(dt) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
  private val eof = rec(0x000a, Array.emptyByteArray)

  /** Assemble globals(+SST)+sheet with a correct BOUNDSHEET offset. */
  private def workbook(sstRecs: Array[Byte], cellRecs: Array[Byte]): Array[Byte] = {
    val name = Array(4.toByte, 0.toByte) ++ "tab1".getBytes("US-ASCII")
    def globals(pos: Int) =
      bof(0x0005) ++ sstRecs ++ rec(0x0085, le32(pos) ++ le16(0) ++ name) ++ eof
    val pos = globals(0).length
    Biff.cfb(globals(pos) ++ bof(0x0010) ++ cellRecs ++ eof)
  }

  test("SST split across CONTINUE records (grbit restarts mid-string) reads back") {
    // string 0: "abcdef" compressed, split "abc" | "def" with a fresh
    // grbit byte at the continue boundary; string 1: "ghí" in UTF-16,
    // split after one code unit
    val sst0 = le32(2) ++ le32(2) ++
      le16(6) ++ Array(0.toByte) ++ "abc".getBytes("US-ASCII")
    val cont0 = Array(0.toByte) ++ "def".getBytes("US-ASCII") ++
      (le16(3) ++ Array(1.toByte) ++ "g".getBytes("UTF-16LE"))
    val cont1 = Array(1.toByte) ++ "hí".getBytes("UTF-16LE")
    val sstRecs = rec(0x00fc, sst0) ++ rec(0x003c, cont0) ++ rec(0x003c, cont1)
    val cells =
      rec(0x00fd, le16(0) ++ le16(0) ++ le16(0) ++ le32(0)) ++
      rec(0x00fd, le16(1) ++ le16(2) ++ le16(0) ++ le32(1))
    val grid = Biff.read(workbook(sstRecs, cells))
    assert(grid(0, 0) == "abcdef")
    assert(grid(1, 2) == "ghí")
  }

  test("RK and MULRK numeric encodings decode (int, x100, and double forms)") {
    def rkInt(v: Int) = (v << 2) | 2
    val dblBits = java.lang.Double.doubleToLongBits(1.5)
    val rkDouble = ((dblBits >>> 32) & 0xfffffffcL).toInt
    val rk = rec(0x027e, le16(0) ++ le16(0) ++ le16(0) ++ le32(rkInt(42))) ++
      rec(0x027e, le16(0) ++ le16(1) ++ le16(0) ++ le32(rkInt(-7))) ++
      rec(0x027e, le16(0) ++ le16(2) ++ le16(0) ++ le32(rkInt(375) | 1)) ++ // 3.75
      rec(0x027e, le16(0) ++ le16(3) ++ le16(0) ++ le32(rkDouble)) ++
      rec(0x00bd, le16(1) ++ le16(4) ++ // MULRK: cols 4..6
        (le16(0) ++ le32(rkInt(1))) ++ (le16(0) ++ le32(rkInt(2))) ++
        (le16(0) ++ le32(rkInt(3))) ++ le16(6))
    val grid = Biff.read(workbook(Array.emptyByteArray, rk))
    assert(grid(0, 0) == "42" && grid(0, 1) == "-7")
    assert(grid(0, 2) == "3.75" && grid(0, 3) == "1.5")
    assert(grid(1, 4) == "1" && grid(1, 5) == "2" && grid(1, 6) == "3")
  }

  test("NUMBER record with a fractional double reads via the IEEE path") {
    val payload = le16(3) ++ le16(9) ++ le16(0) ++
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(55.25).array()
    val grid = Biff.read(workbook(Array.emptyByteArray, rec(0x0203, payload)))
    assert(grid(3, 9) == "55.25")
  }

  test("FORMULA cached results: double inline, string via STRING, bool, error, blank") {
    val sentinel = (t: Int, v: Int) =>
      Array(t.toByte, 0.toByte, v.toByte, 0.toByte, 0.toByte, 0.toByte,
        0xff.toByte, 0xff.toByte)
    val dbl = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(12.5).array()
    val tail = le16(0) ++ le32(0) ++ le16(0) // grbit, chn, cce=0 (no rgce needed)
    val cells =
      rec(0x0006, le16(0) ++ le16(0) ++ le16(0) ++ dbl ++ tail) ++
      rec(0x0006, le16(0) ++ le16(1) ++ le16(0) ++ sentinel(0, 0) ++ tail) ++
      rec(0x0207, le16(4) ++ Array(0.toByte) ++ "SOMA".getBytes("US-ASCII")) ++
      rec(0x0006, le16(0) ++ le16(2) ++ le16(0) ++ sentinel(1, 1) ++ tail) ++
      rec(0x0006, le16(0) ++ le16(3) ++ le16(0) ++ sentinel(2, 0x2a) ++ tail) ++ // #N/A
      rec(0x0006, le16(0) ++ le16(4) ++ le16(0) ++ sentinel(3, 0) ++ tail)
    val grid = Biff.read(workbook(Array.emptyByteArray, cells))
    assert(grid(0, 0) == "12.5")
    assert(grid(0, 1) == "SOMA")
    assert(grid(0, 2) == "1")
    assert(!grid.cells.contains((0, 3)), "cached error must be skipped")
    assert(grid(0, 4) == "")
  }

  test("a stray STRING record without a pending FORMULA is ignored") {
    val cells =
      rec(0x0207, le16(3) ++ Array(0.toByte) ++ "xyz".getBytes("US-ASCII")) ++
      rec(0x0203, le16(0) ++ le16(0) ++ le16(0) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(1.0).array())
    val grid = Biff.read(workbook(Array.emptyByteArray, cells))
    assert(grid.cells == Map((0, 0) -> "1"))
  }

  // ---- BIFF5: inline byte-string LABELs, no SST, byte-string STRING

  private def bof5(dt: Int) =
    rec(0x0809, le16(0x0500) ++ le16(dt) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))

  private def workbook5(cellRecs: Array[Byte]): Array[Byte] = {
    val name = Array(4.toByte) ++ "tab1".getBytes("US-ASCII") // 8-bit cch in BIFF5
    def globals(pos: Int) =
      bof5(0x0005) ++ rec(0x0085, le32(pos) ++ le16(0) ++ name) ++ eof
    val pos = globals(0).length
    Biff.cfb(globals(pos) ++ bof5(0x0010) ++ cellRecs ++ eof)
  }

  test("BIFF5 worksheet: NUMBER, RK, byte-string LABEL, BOOLERR, FORMULA+STRING") {
    def rkInt(v: Int) = (v << 2) | 2
    val tail = le16(0) ++ le32(0) ++ le16(0)
    val cells =
      rec(0x0203, le16(0) ++ le16(0) ++ le16(0) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(55.25).array()) ++
      rec(0x027e, le16(0) ++ le16(1) ++ le16(0) ++ le32(rkInt(42))) ++
      rec(0x0204, le16(0) ++ le16(2) ++ le16(0) ++ le16(9) ++
        "Relatório".map(_.toByte).toArray) ++ // Latin-1 bytes, no grbit in BIFF5
      rec(0x0205, le16(0) ++ le16(3) ++ le16(0) ++ Array(1.toByte, 0.toByte)) ++
      rec(0x0006, le16(0) ++ le16(4) ++ le16(0) ++
        Array(0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte,
          0xff.toByte, 0xff.toByte) ++ tail) ++
      rec(0x0207, le16(5) ++ "média".map(_.toByte).toArray)
    val grid = Biff.read(workbook5(cells))
    assert(grid(0, 0) == "55.25")
    assert(grid(0, 1) == "42")
    assert(grid(0, 2) == "Relatório")
    assert(grid(0, 3) == "1")
    assert(grid(0, 4) == "média")
  }

  test("pre-BIFF5 versions still fail loudly") {
    val biff4 = rec(0x0809,
      le16(0x0400) ++ le16(0x0005) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0)) ++ eof
    val e = intercept[IllegalArgumentException](Biff.read(Biff.cfb(biff4)))
    assert(e.getMessage.contains("BIFF"))
  }

  test("non-Excel CFB and non-CFB payloads fail loudly") {
    intercept[IllegalArgumentException](Biff.read(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Biff.read(new Array[Byte](512)))
  }
}
