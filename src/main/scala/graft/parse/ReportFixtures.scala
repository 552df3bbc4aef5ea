package graft.parse

import scala.collection.mutable

import graft.parse.CellGrid

/** Deterministic radar-report workbook fixtures reproducing the three
  * layouts of /root/reference/src/clean_data.py:66-94 at the exact
  * coordinates documented in FIXTURES.md §A1 (0-based (row, col)):
  *  - (2,1) header whose first line's 2nd token is the D/M/YYYY date
  *  - (5,1) "EQUIP-street" (equipment before first '-')
  *  - (5,15) block-1 direction "Street/N"
  *  - data rows from row 8; bins at cols 5,7,9,10,12,13,14,15,17,18,20;
  *    total at col 21; time_range at col 1
  *  - sentinel "Total Geral" at (105,1) / (206,1) / (201,1) and total
  *    sheet rows 109 / 210 / 205 for templates 1 / 2 / 3.
  */
object ReportFixtures {

  val equipment = "FS551JOI"
  val pubdateIso = "2021-03-05"

  /** "2021-03-05" → "5/3/2021" (the header's D/M/YYYY form, unpadded as
    * the portal emits it). */
  private def dmy(iso: String): String = {
    val Array(y, m, d) = iso.split("-")
    s"${d.toInt}/${m.toInt}/$y"
  }

  /** Any template for any (equipment, isoDate) — for multi-file fixtures. */
  def workbook(template: Int, equipment: String, isoDate: String): CellGrid = {
    val grid = template match {
      case 1 => template1()
      case 2 => template2()
      case 3 => template3()
      case _ => invalidTemplate()
    }
    CellGrid(grid.cells
      + ((2, 1) -> s"Relatório ${dmy(isoDate)}\nMonitran")
      + ((5, 1) -> s"$equipment-Rua Blumenau"))
  }

  def slot(i: Int): String = {
    val s = (i * 15) % 1440
    val e = ((i + 1) * 15) % 1440
    f"${s / 60}%02d:${s % 60}%02d as ${e / 60}%02d:${e % 60}%02d"
  }

  /** Deterministic bin counts for data row i; sum(bins) == total holds. */
  def binsFor(i: Int): Seq[Int] = (0 until 11).map(j => (i + j * 3) % 7)

  private def header(cells: mutable.Map[(Int, Int), String], direction1: String): Unit = {
    cells((2, 1)) = "Relatório 5/3/2021\nMonitran"
    cells((5, 1)) = s"$equipment-Rua Blumenau"
    cells((5, 15)) = direction1
  }

  private def dataBlock(cells: mutable.Map[(Int, Int), String],
      begin: Int, n: Int, slotOffset: Int): Unit = {
    val binCols = Seq(5, 7, 9, 10, 12, 13, 14, 15, 17, 18, 20)
    for (i <- 0 until n) {
      val r = begin + i
      cells((r, 1)) = slot((slotOffset + i) % 96)
      val bs = binsFor(slotOffset + i)
      binCols.zip(bs).foreach { case (c, v) => cells((r, c)) = v.toString }
      cells((r, 21)) = bs.sum.toString
    }
  }

  def template1(direction: String = "Centro/N"): CellGrid = {
    val cells = mutable.Map[(Int, Int), String]()
    header(cells, direction)
    dataBlock(cells, 8, 96, 0)
    cells((105, 1)) = "Total Geral"
    cells((108, 0)) = "fim"   // pads sheet to nrows == 109
    CellGrid(cells.toMap)
  }

  def template2(dir1: String = "Centro/N", dir2: String = "Centro/S"): CellGrid = {
    val cells = mutable.Map[(Int, Int), String]()
    header(cells, dir1)
    dataBlock(cells, 8, 96, 0)
    cells((106, 15)) = dir2
    dataBlock(cells, 109, 96, 96)
    cells((206, 1)) = "Total Geral"
    cells((209, 0)) = "fim"   // nrows == 210
    CellGrid(cells.toMap)
  }

  def template3(direction: String = "Centro/L"): CellGrid = {
    val cells = mutable.Map[(Int, Int), String]()
    header(cells, direction)
    dataBlock(cells, 8, 192, 0)
    cells((201, 1)) = "Total Geral"
    cells((204, 0)) = "fim"   // nrows == 205
    CellGrid(cells.toMap)
  }

  /** Wrong shape: right sentinel text but offset rows — must not match. */
  def invalidTemplate(): CellGrid = {
    val cells = mutable.Map[(Int, Int), String]()
    header(cells, "Centro/N")
    dataBlock(cells, 8, 40, 0)
    cells((50, 1)) = "Total Geral"
    CellGrid(cells.toMap)
  }
}
