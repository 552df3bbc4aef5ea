package graft.parse

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

/** Sparse spreadsheet grid, 0-based (row, col) like xlrd's `sheet.cell(r,c)`.
  * `nrows` mirrors xlrd's `sheet.nrows`: 1 + the highest row index holding
  * any cell (template detection keys on it, clean_data.py:66-71).
  */
final case class CellGrid(cells: Map[(Int, Int), String]) {
  val nrows: Int = if (cells.isEmpty) 0 else cells.keysIterator.map(_._1).max + 1
  def apply(r: Int, c: Int): String = cells.getOrElse((r, c), "")
}

/** Minimal XLSX codec built on the JDK only (java.util.zip + StAX) — the
  * engine's replacement for the reference's xlrd/xlwt dependency
  * (clean_data.py:53,143). Supports shared strings, inline strings, and
  * numeric cells; one worksheet. Deliberately small: radar reports are
  * ~100 files/day of ~200 rows (SURVEY.md §4), so a DataSourceV2 is not
  * warranted — files parse inside `flatMap` on executors.
  */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** "B3" → (2, 1). */
  def parseRef(ref: String): (Int, Int) = {
    val (letters, digits) = ref.span(_.isLetter)
    val col = letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
    (digits.toInt - 1, col)
  }

  /** (2, 1) → "B3". */
  def toRef(r: Int, c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) { val rem = (n - 1) % 26; sb.insert(0, ('A' + rem).toChar); n = (n - 1) / 26 }
    sb.append((r + 1).toString).toString
  }

  def read(bytes: Array[Byte]): CellGrid = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheetXml: Option[Array[Byte]] = None
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      val sheets = mutable.Map[String, Array[Byte]]()
      var sharedXml: Option[Array[Byte]] = None
      var workbookXml: Option[Array[Byte]] = None
      var relsXml: Option[Array[Byte]] = None
      while (entry != null) {
        val name = entry.getName
        if (name == "xl/sharedStrings.xml") sharedXml = Some(zin.readAllBytes())
        else if (name == "xl/workbook.xml") workbookXml = Some(zin.readAllBytes())
        else if (name == "xl/_rels/workbook.xml.rels") relsXml = Some(zin.readAllBytes())
        else if (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml"))
          sheets(name) = zin.readAllBytes()
        entry = zin.getNextEntry
      }
      sharedXml.foreach(b => shared = readSharedStrings(b))
      // "first" sheet = the workbook's TAB order (xlrd's sheets()[0],
      // clean_data.py:53), resolved via workbook.xml's first <sheet r:id>
      // and the rels map — NOT zip-entry name order, which misorders
      // sheet10 before sheet2 and survives sheet deletion/reordering.
      // Fallback (no workbook.xml): numeric-suffix order of the parts.
      val byWorkbook = for {
        wb <- workbookXml
        rels <- relsXml
        rid <- firstSheetRid(wb)
        target <- relTarget(rels, rid)
        part = "xl/" + target.stripPrefix("/xl/").stripPrefix("/")
        xml <- sheets.get(part)
      } yield xml
      def suffixNum(name: String): Int =
        name.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml") match {
          case n if n.nonEmpty && n.forall(_.isDigit) => n.toInt
          case _ => Int.MaxValue
        }
      sheetXml = byWorkbook.orElse(
        sheets.keys.toSeq.sortBy(n => (suffixNum(n), n)).headOption.map(sheets))
    } finally zin.close()
    sheetXml match {
      case Some(xml) => readSheet(xml, shared)
      case None => throw new IllegalArgumentException("no worksheet found in xlsx payload")
    }
  }

  /** r:id of the first <sheet> in workbook.xml (tab order). */
  private def firstSheetRid(xml: Array[Byte]): Option[String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "id") return Some(r.getAttributeValue(i))
            i += 1
          }
        }
      }
      None
    } finally r.close()
  }

  /** Relationship Id → Target from workbook.xml.rels. */
  private def relTarget(xml: Array[Byte], rid: String): Option[String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          var id: String = null
          var target: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            r.getAttributeLocalName(i) match {
              case "Id" => id = r.getAttributeValue(i)
              case "Target" => target = r.getAttributeValue(i)
              case _ =>
            }
            i += 1
          }
          if (id == rid && target != null) return Some(target)
        }
      }
      None
    } finally r.close()
  }

  private def readSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    var cur: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" if cur != null => cur.append(r.getElementText)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" && cur != null =>
          out += cur.toString; cur = null
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  private def readSheet(xml: Array[Byte], shared: IndexedSeq[String]): CellGrid = {
    val cells = mutable.Map[(Int, Int), String]()
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    var ref: String = null
    var typ: String = null
    var inIs = false
    val text = new StringBuilder
    var haveValue = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "c" =>
              ref = r.getAttributeValue(null, "r")
              typ = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text.clear(); haveValue = false; inIs = false
            case "is" => inIs = true
            case "v" if ref != null =>
              text.append(r.getElementText); haveValue = true
            case "t" if inIs =>
              text.append(r.getElementText); haveValue = true
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "c" && ref != null =>
          if (haveValue) {
            val raw = text.toString
            val value = typ match {
              case "s" => shared(raw.trim.toInt)
              case _ => raw
            }
            cells(Xlsx.parseRef(ref)) = value
          }
          ref = null
        case _ =>
      }
    }
    CellGrid(cells.toMap)
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def isNumeric(s: String): Boolean =
    s.nonEmpty && s.forall(ch => ch.isDigit || ch == '.' || ch == '-') &&
      scala.util.Try(s.toDouble).isSuccess

  /** Serialize a grid as a single-sheet xlsx (inline strings, numeric cells
    * for numeric-looking values). Deterministic output: fixed zip entry
    * timestamps, sorted cell order.
    */
  def write(grid: CellGrid): Array[Byte] = {
    val rows = grid.cells.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (r, cs) =>
      val cellsXml = cs.toSeq.sortBy(_._1._2).map { case ((rr, cc), v) =>
        if (isNumeric(v)) s"""<c r="${toRef(rr, cc)}"><v>${xmlEscape(v)}</v></c>"""
        else s"""<c r="${toRef(rr, cc)}" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cellsXml</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rows</sheetData></worksheet>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="tab1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""".stripMargin

    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zos.putNextEntry(e)
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("_rels/.rels", rootRels)
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", workbookRels)
    put("xl/worksheets/sheet1.xml", sheet)
    zos.close()
    bos.toByteArray
  }
}
