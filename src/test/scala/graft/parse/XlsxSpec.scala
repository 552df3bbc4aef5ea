package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class XlsxSpec extends AnyFunSuite {

  test("cell ref codec round-trips") {
    assert(Xlsx.parseRef("A1") == (0, 0))
    assert(Xlsx.parseRef("B3") == (2, 1))
    assert(Xlsx.parseRef("V9") == (8, 21))
    assert(Xlsx.parseRef("AA10") == (9, 26))
    for ((r, c) <- Seq((0, 0), (2, 1), (8, 21), (9, 26), (104, 51)))
      assert(Xlsx.parseRef(Xlsx.toRef(r, c)) == (r, c))
  }

  test("write → read round-trips strings, numbers, newlines") {
    val grid = CellGrid(Map(
      (0, 0) -> "hello",
      (2, 1) -> "Relatório 5/3/2021\nMonitran",
      (5, 1) -> "FS551JOI-Rua X",
      (3, 5) -> "42",
      (3, 7) -> "3.5",
      (10, 2) -> "a<b&c>\"d\""))
    val back = Xlsx.read(Xlsx.write(grid))
    assert(back.cells == grid.cells)
    assert(back.nrows == 11)
  }

  test("nrows mirrors xlrd semantics (1 + max occupied row)") {
    assert(CellGrid(Map((108, 0) -> "x")).nrows == 109)
    assert(CellGrid(Map.empty).nrows == 0)
  }

  test("unreadable payload raises") {
    intercept[Exception](Xlsx.read(Array[Byte](1, 2, 3)))
  }
}
