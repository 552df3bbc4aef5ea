package graft.parse

import scala.util.Try

import graft.model.Model.{ParsedReport, ParseError, RawFlowRow}

/** The radar-report normalizer: one Excel payload → tidy flow rows.
  *
  * Pure `Array[Byte] => Either[ParseError, ParsedReport]`, designed to run
  * inside `flatMap` on executors (one task ≈ one (equipment, date) file,
  * perfectly partitionable — SURVEY.md §3). Faithful to the reference's
  * `create_clean_wb` (/root/reference/src/clean_data.py:52-136):
  *
  *  - header date at cell (2,1): first line, second token, D/M/YYYY →
  *    "yyyy-MM-dd" (clean_data.py:57-58);
  *  - equipment at cell (5,1), prefix before first '-' (clean_data.py:59);
  *  - template detection on (nrows, "Total Geral" sentinel):
  *    1 = 109 rows / sentinel (105,1) / one 96-row block,
  *    2 = 210 rows / sentinel (206,1) / two 96-row blocks (second block at
  *        row 109, its direction at (106,15)),
  *    3 = 205 rows / sentinel (201,1) / one 192-row block
  *    (clean_data.py:66-94);
  *  - per data row, columns {1,5,7,9,10,12,13,14,15,17,18,20,21} hold
  *    time_range, the 11 speed bins, and total (clean_data.py:102-114).
  *
  * Unknown layouts yield Left(ParseError) instead of the reference's raise
  * (clean_data.py:72-73) so one bad file cannot kill a 100 TB batch.
  */
object ReportParser {

  private val dataBegin = 8
  private val binCols = Seq(5, 7, 9, 10, 12, 13, 14, 15, 17, 18, 20)
  private val totalCol = 21

  /** Container sniff, not extension trust: the portal serves both `.xlsx`
    * (zip, "PK") and legacy `.xls` (CFB, D0 CF 11 E0) under interchanging
    * names — xlrd accepted either (clean_data.py:53). */
  private def readWorkbook(bytes: Array[Byte]): CellGrid =
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0) Biff.read(bytes)
    else Xlsx.read(bytes)

  def parse(source: String, bytes: Array[Byte]): Either[ParseError, ParsedReport] =
    Try(readWorkbook(bytes)).toEither.left
      .map(e => ParseError(source, s"unreadable workbook: ${e.getMessage}"))
      .flatMap(grid => parseGrid(source, grid))

  def parseGrid(source: String, sheet: CellGrid): Either[ParseError, ParsedReport] = {
    val header = for {
      pubdate <- headerDate(sheet)
      equipment <- headerEquipment(sheet)
    } yield (pubdate, equipment)

    header match {
      case Left(msg) => Left(ParseError(source, msg))
      case Right((pubdate, equipment)) =>
        detectTemplate(sheet) match {
          case None =>
            // clean_data.py:72-73
            Left(ParseError(source, s"No template was found for $equipment$pubdate"))
          case Some(template) =>
            val blocks: Seq[(Int, String)] = template match {
              case 1 => Seq((dataBegin, sheet(5, 15)))
              case 2 => Seq((dataBegin, sheet(5, 15)), (109, sheet(106, 15)))
              case 3 => Seq((dataBegin, sheet(5, 15)))
            }
            val blockLen = if (template == 3) 192 else 96
            val rows = Try {
              for {
                (begin, direction) <- blocks
                i <- 0 until blockLen
                r = begin + i
              } yield RawFlowRow(
                pubdate, equipment, direction, sheet(r, 1),
                num(sheet(r, binCols(0))), num(sheet(r, binCols(1))),
                num(sheet(r, binCols(2))), num(sheet(r, binCols(3))),
                num(sheet(r, binCols(4))), num(sheet(r, binCols(5))),
                num(sheet(r, binCols(6))), num(sheet(r, binCols(7))),
                num(sheet(r, binCols(8))), num(sheet(r, binCols(9))),
                num(sheet(r, binCols(10))), num(sheet(r, totalCol)))
            }
            rows.toEither.left
              .map(e => ParseError(source, s"bad data row: ${e.getMessage}"))
              .map(rs => ParsedReport(source, pubdate, equipment, template, rs))
        }
    }
  }

  /** clean_data.py:57-58 — split("\n")[0].split(" ")[1], "/"→"-", reorder
    * to %Y-%m-%d with zero-padding. */
  private def headerDate(sheet: CellGrid): Either[String, String] = {
    val cell = sheet(2, 1)
    val tokens = cell.split("\n", -1)(0).split(" ")
    if (tokens.length < 2) Left(s"header cell (2,1) has no date token: '$cell'")
    else {
      val parts = tokens(1).replace("/", "-").split("-")
      if (parts.length != 3 || Try(parts.foreach(_.toInt)).isFailure)
        Left(s"header cell (2,1) date not D/M/YYYY: '${tokens(1)}'")
      else {
        val pad2 = (s: String) => if (s.length >= 2) s else "0" * (2 - s.length) + s
        Right(parts(2) + "-" + pad2(parts(1)) + "-" + pad2(parts(0)))
      }
    }
  }

  /** clean_data.py:59 — equipment id before the first '-'. */
  private def headerEquipment(sheet: CellGrid): Either[String, String] = {
    val cell = sheet(5, 1)
    if (cell.isEmpty) Left("header cell (5,1) empty — no equipment id")
    else Right(cell.split("-")(0))
  }

  /** clean_data.py:66-71. */
  private[parse] def detectTemplate(sheet: CellGrid): Option[Int] =
    if (sheet.nrows == 109 && sheet(105, 1).trim == "Total Geral") Some(1)
    else if (sheet.nrows == 210 && sheet(206, 1).trim == "Total Geral") Some(2)
    else if (sheet.nrows == 205 && sheet(201, 1).trim == "Total Geral") Some(3)
    else None

  /** xlrd hands back numerics as floats; counts arrive as "12" or "12.0". */
  private def num(s: String): Int =
    if (s.isEmpty) 0 else s.toDouble.toInt
}
