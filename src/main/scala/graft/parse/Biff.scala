package graft.parse

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

/** Minimal legacy `.xls` (BIFF8-in-CFB) codec built on the JDK only —
  * S2 parity with the reference's xlrd path, which accepts both `.xls`
  * and `.xlsx` from the portal (/root/reference/src/clean_data.py:53,
  * requirements.txt xlrd). Same [[CellGrid]] contract as [[Xlsx]];
  * [[ReportParser.parse]] sniffs the container magic and dispatches.
  *
  * Read side (the compatibility surface, shaped for real portal files):
  *  - CFB v3/v4 containers, FAT and mini-FAT stream placement;
  *  - BIFF8 records NUMBER, RK, MULRK, LABEL, LABELSST, BOOLERR, and the
  *    SST including CONTINUE spans (the grbit byte restarts at each
  *    segment boundary inside character data — [MS-XLS] 2.5.293);
  *  - FORMULA cells' CACHED results, xlrd-style (doubles inline; strings
  *    via the trailing STRING record; booleans as 1/0; cached errors
  *    skipped like BOOLERR errors) — the formula expression itself is
  *    never evaluated, exactly as xlrd;
  *  - BIFF5 (BOF version 0x0500) worksheets: same numeric records,
  *    inline byte-string LABELs instead of the SST (no LABELSST/SST in
  *    BIFF5), byte-string STRING records. Byte strings decode as
  *    Latin-1; CODEPAGE-dependent DBCS decoding is out of scope and only
  *    affects pre-1997 non-Latin workbooks;
  *  - first sheet in BOUNDSHEET (tab) order, matching xlrd sheets()[0].
  *  Out of scope, failing loudly instead of misreading: BIFF4-and-older
  *  streams (no BOUNDSHEET directory).
  *
  * Write side (fixture generation only): single sheet, NUMBER records
  * for values whose decimal text survives a double round-trip, inline
  * LABEL strings otherwise — so CellGrid → write → read is identity on
  * the string grid, the same guarantee the XLSX writer gives.
  */
object Biff {

  // ---------------------------------------------------------------- read

  /** Little-endian cursor over a byte array. */
  private final class Cur(val a: Array[Byte], var p: Int) {
    def u8(): Int = { val v = a(p) & 0xff; p += 1; v }
    def u16(): Int = { val v = (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8); p += 2; v }
    def i32(): Int = { val v = u16() | (u16() << 16); v }
    def skip(n: Int): Unit = p += n
    def bytes(n: Int): Array[Byte] = { val v = a.slice(p, p + n); p += n; v }
    def remaining: Int = a.length - p
  }

  private val ENDOFCHAIN = 0xfffffffe
  private val FREESECT = 0xffffffff

  /** Extract the Workbook/Book stream from a CFB container. */
  private[parse] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 512 &&
      (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0,
      "not a CFB (OLE2) container")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sectorSize = 1 << bb.getShort(30)
    val nFat = bb.getInt(44)
    val dirStart = bb.getInt(48)
    val miniCutoff = bb.getInt(56)
    val miniFatStart = bb.getInt(60)
    val difatStart = bb.getInt(68)
    val nDifat = bb.getInt(72)
    def sector(id: Int): Array[Byte] = {
      val off = (id + 1).toLong * sectorSize // header pads to one sector
      bytes.slice(off.toInt, off.toInt + sectorSize)
    }
    // FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer[Int]()
    for (i <- 0 until math.min(109, nFat))
      fatSectors += bb.getInt(76 + 4 * i)
    var ds = difatStart
    var dGuard = 0
    while (ds != ENDOFCHAIN && ds != FREESECT && dGuard <= nDifat) {
      val s = ByteBuffer.wrap(sector(ds)).order(ByteOrder.LITTLE_ENDIAN)
      val perSector = sectorSize / 4 - 1
      for (i <- 0 until perSector) {
        val v = s.getInt(4 * i)
        if (v != FREESECT && fatSectors.size < nFat) fatSectors += v
      }
      ds = s.getInt(sectorSize - 4)
      dGuard += 1
    }
    val fat: Array[Int] = fatSectors.iterator.flatMap { sid =>
      val s = ByteBuffer.wrap(sector(sid)).order(ByteOrder.LITTLE_ENDIAN)
      (0 until sectorSize / 4).map(i => s.getInt(4 * i))
    }.toArray
    def chain(start: Int, size: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != ENDOFCHAIN && sid >= 0 && guard <= fat.length) {
        out.write(sector(sid))
        sid = fat(sid)
        guard += 1
      }
      out.toByteArray.take(if (size >= 0) size.toInt else out.size())
    }
    // directory entries: 128 bytes each, across the directory chain
    val dir = chain(dirStart, -1L)
    final case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val e = ByteBuffer.wrap(dir, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = e.getShort(i * 128 + 64) & 0xffff
      val name = if (nameLen >= 2)
        new String(dir, i * 128, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dir(i * 128 + 66) & 0xff,
        e.getInt(i * 128 + 116), e.getLong(i * 128 + 120))
    }
    val root = entries.find(_.objType == 5)
      .getOrElse(throw new IllegalArgumentException("CFB has no root entry"))
    val wb = entries.find(e => e.objType == 2 &&
        (e.name.equalsIgnoreCase("Workbook") || e.name.equalsIgnoreCase("Book")))
      .getOrElse(throw new IllegalArgumentException(
        "CFB has no Workbook/Book stream — not an Excel .xls"))
    if (wb.size >= miniCutoff) chain(wb.start, wb.size)
    else {
      // mini-stream: 64-byte sectors inside the root entry's chain,
      // chained through the mini-FAT (itself a regular-FAT stream)
      val container = chain(root.start, root.size)
      val miniFatBytes = chain(miniFatStart, -1L)
      val mf = ByteBuffer.wrap(miniFatBytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = new ByteArrayOutputStream()
      var sid = wb.start
      var guard = 0
      while (sid != ENDOFCHAIN && sid >= 0 && guard <= miniFatBytes.length / 4) {
        out.write(container, sid * 64, math.min(64, container.length - sid * 64))
        sid = mf.getInt(4 * sid)
        guard += 1
      }
      out.toByteArray.take(wb.size.toInt)
    }
  }

  /** xlrd-style float → grid text: integral doubles print without ".0". */
  private def fmtNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble // 30-bit signed integer
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** BIFF8 record stream → (type, payload) iterator positions. */
  private def records(a: Array[Byte]): Iterator[(Int, Int, Int)] =
    new Iterator[(Int, Int, Int)] {
      private var p = 0
      def hasNext: Boolean = p + 4 <= a.length && {
        val t = (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
        val len = (a(p + 2) & 0xff) | ((a(p + 3) & 0xff) << 8)
        t != 0 && p + 4 + len <= a.length // 0 = padding after the last EOF
      }
      def next(): (Int, Int, Int) = {
        val t = (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
        val len = (a(p + 2) & 0xff) | ((a(p + 3) & 0xff) << 8)
        val off = p + 4
        p = off + len
        (t, off, len)
      }
    }

  /** Parse the SST from its (record ++ CONTINUE*) segment list. */
  private def parseSst(segments: Seq[(Int, Int)], a: Array[Byte]): IndexedSeq[String] = {
    // cursor over concatenated segments that knows segment boundaries
    var seg = 0
    var p = segments.head._1
    def segEnd = segments(seg)._1 + segments(seg)._2
    def atBoundary(): Boolean = p >= segEnd && seg < segments.length - 1
    def advance(): Unit = { seg += 1; p = segments(seg)._1 }
    def u8(): Int = { if (atBoundary()) advance(); val v = a(p) & 0xff; p += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def skipBytes(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (atBoundary()) advance()
        val take = math.min(left, segEnd - p)
        p += take; left -= take
      }
    }
    val cstUnique = { i32(); i32() } // cstTotal discarded, cstUnique kept
    val out = new mutable.ArrayBuffer[String](cstUnique)
    for (_ <- 0 until cstUnique) {
      val cch = u16()
      val flags = u8()
      var high = (flags & 1) != 0
      val cRun = if ((flags & 8) != 0) u16() else 0
      val cbExt = if ((flags & 4) != 0) i32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        if (atBoundary()) {
          // a string split mid-characters restarts with a fresh grbit
          advance()
          high = (a(p) & 1) != 0
          p += 1
        }
        val avail = segEnd - p
        val charBytes = if (high) 2 else 1
        val take = math.min(cch - read, avail / charBytes)
        if (take == 0 && avail > 0 && high) {
          // split inside a UTF-16 code unit cannot happen per spec
          throw new IllegalArgumentException("SST continue split mid-char")
        }
        if (high) {
          sb.append(new String(a, p, take * 2, "UTF-16LE"))
          p += take * 2
        } else {
          var i = 0
          while (i < take) { sb.append((a(p + i) & 0xff).toChar); i += 1 }
          p += take
        }
        read += take
      }
      skipBytes(cRun * 4 + cbExt)
      out += sb.toString
    }
    out.toIndexedSeq
  }

  /** BIFF5 strings are codepage byte strings; BIFF8's compressed form is
    * the same low-byte layout. Decoded as Latin-1 (see scaladoc). */
  private def byteString(c: Cur, cch: Int): String = {
    val b = c.bytes(cch)
    val sb = new java.lang.StringBuilder(cch)
    b.foreach(x => sb.append((x & 0xff).toChar))
    sb.toString
  }

  def read(bytes: Array[Byte]): CellGrid = {
    val wb = workbookStream(bytes)
    // globals pass: BOF version check, BOUNDSHEET offsets, SST
    val recs = records(wb).toVector
    val biff5 = recs.headOption match {
      case Some((0x0809, off, len)) if len >= 4 =>
        val vers = (wb(off) & 0xff) | ((wb(off + 1) & 0xff) << 8)
        vers match {
          case 0x0600 => false
          case 0x0500 => true
          case v => throw new IllegalArgumentException(
            f"unsupported BIFF version 0x$v%04x (only BIFF5/BIFF8 are supported)")
        }
      case _ => throw new IllegalArgumentException("workbook stream has no BOF")
    }
    // the globals substream runs from the leading BOF to the FIRST
    // top-level EOF (no BOF nests inside globals); scan it for the
    // BOUNDSHEET directory and the SST
    val sheetOffsets = mutable.ArrayBuffer[Int]()
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var i = 0
    var inGlobals = true
    while (i < recs.length && inGlobals) {
      val (t, off, len) = recs(i)
      t match {
        case 0x000a => inGlobals = false
        case 0x0085 => // BOUNDSHEET: lbPlyPos, grbit, name
          val pos = new Cur(wb, off).i32()
          val hidden = (wb(off + 4) & 0x03) != 0
          if (!hidden) sheetOffsets += pos
        case 0x00fc => // SST ++ CONTINUE*
          val segs = mutable.ArrayBuffer((off, len))
          var j = i + 1
          while (j < recs.length && recs(j)._1 == 0x003c) {
            segs += ((recs(j)._2, recs(j)._3)); j += 1
          }
          sst = parseSst(segs.toSeq, wb)
        case _ =>
      }
      i += 1
    }
    val firstSheet = sheetOffsets.headOption.getOrElse(
      throw new IllegalArgumentException("no visible worksheet in workbook"))
    // sheet pass, from the BOUNDSHEET-declared BOF
    val cells = mutable.Map[(Int, Int), String]()
    val sheet = wb.drop(firstSheet)
    val it = records(sheet)
    var done = false
    var sawBof = false
    // a FORMULA whose cached result is a string parks its cell here until
    // the trailing STRING record delivers the value ([MS-XLS] 2.4.127)
    var pendingString: Option[(Int, Int)] = None
    while (!done && it.hasNext) {
      val (t, off, len) = it.next()
      t match {
        case 0x0809 if sawBof => // nested BOF (charts) — skip to its EOF
          var d = 1
          while (d > 0 && it.hasNext) it.next()._1 match {
            case 0x0809 => d += 1
            case 0x000a => d -= 1
            case _ =>
          }
        case 0x0809 => sawBof = true
        case 0x000a => done = true
        case 0x0203 => // NUMBER
          val c = new Cur(sheet, off)
          val (r, cl) = (c.u16(), c.u16()); c.skip(2)
          val d = ByteBuffer.wrap(sheet, c.p, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
          cells((r, cl)) = fmtNum(d)
        case 0x027e => // RK
          val c = new Cur(sheet, off)
          val (r, cl) = (c.u16(), c.u16()); c.skip(2)
          cells((r, cl)) = fmtNum(decodeRk(c.i32()))
        case 0x00bd => // MULRK: row, colFirst, (ixfe, rk)*, colLast
          val c = new Cur(sheet, off)
          val r = c.u16(); val colFirst = c.u16()
          val n = (len - 6) / 6
          for (k <- 0 until n) {
            c.skip(2)
            cells((r, colFirst + k)) = fmtNum(decodeRk(c.i32()))
          }
        case 0x00fd => // LABELSST
          val c = new Cur(sheet, off)
          val (r, cl) = (c.u16(), c.u16()); c.skip(2)
          cells((r, cl)) = sst(c.i32())
        case 0x0204 => // LABEL: BIFF8 XLUnicodeString / BIFF5 byte string
          val c = new Cur(sheet, off)
          val (r, cl) = (c.u16(), c.u16()); c.skip(2)
          val cch = c.u16()
          cells((r, cl)) =
            if (biff5) byteString(c, cch)
            else if ((c.u8() & 1) != 0) new String(c.bytes(cch * 2), "UTF-16LE")
            else byteString(c, cch)
        case 0x0006 => // FORMULA: cached result, never the expression
          val c = new Cur(sheet, off)
          val (r, cl) = (c.u16(), c.u16()); c.skip(2)
          val vb = c.bytes(8)
          if ((vb(6) & 0xff) == 0xff && (vb(7) & 0xff) == 0xff)
            (vb(0) & 0xff) match {
              case 0 => pendingString = Some((r, cl)) // value follows in STRING
              case 1 => cells((r, cl)) = if (vb(2) != 0) "1" else "0"
              case 2 => // cached error — skipped, like BOOLERR errors
              case 3 => cells((r, cl)) = "" // cached empty string
              case x => throw new IllegalArgumentException(
                s"unknown FORMULA cached-value sentinel type $x")
            }
          else {
            val d = ByteBuffer.wrap(vb).order(ByteOrder.LITTLE_ENDIAN).getDouble
            cells((r, cl)) = fmtNum(d)
          }
        case 0x0207 => // STRING: the parked FORMULA's cached string value
          pendingString.foreach { rc =>
            val c = new Cur(sheet, off)
            val cch = c.u16()
            cells(rc) =
              if (biff5) byteString(c, cch)
              else if ((c.u8() & 1) != 0) new String(c.bytes(cch * 2), "UTF-16LE")
              else byteString(c, cch)
            pendingString = None
          }
        case 0x0205 => // BOOLERR: booleans as xlrd's 1/0; errors skipped
          val c = new Cur(sheet, off)
          val (r, cl) = (c.u16(), c.u16()); c.skip(2)
          val v = c.u8(); val isErr = c.u8()
          if (isErr == 0) cells((r, cl)) = if (v != 0) "1" else "0"
        case _ =>
      }
    }
    CellGrid(cells.toMap)
  }

  // --------------------------------------------------------------- write

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)

  private def record(t: Int, payload: Array[Byte]): Array[Byte] = {
    // BIFF8 caps a record body at 8224 bytes; longer strings need CONTINUE
    // spans, which this fixture-grade writer does not emit. Fail loudly
    // (matching the read side's posture) instead of length-wrapping the u16
    // and silently corrupting the stream.
    require(payload.length <= 8224,
      s"BIFF record 0x${t.toHexString} payload ${payload.length} B exceeds the " +
        "8224 B record cap; CONTINUE-span writing is unsupported")
    le16(t) ++ le16(payload.length) ++ payload
  }

  /** Numeric values only when the decimal text survives double round-trip
    * (e.g. "2.10" must stay a string or it would read back "2.1"). */
  private def numericStable(s: String): Option[Double] =
    if (s.isEmpty || !s.forall(ch => ch.isDigit || ch == '.' || ch == '-')) None
    else scala.util.Try(s.toDouble).toOption.filter(d => fmtNum(d) == s)

  private def xlUnicode(s: String, shortLen: Boolean): Array[Byte] = {
    val high = s.exists(_ > 0xff)
    val len = if (shortLen) Array(s.length.toByte) else le16(s.length)
    val chars =
      if (high) s.getBytes("UTF-16LE")
      else s.map(_.toByte).toArray
    len ++ Array((if (high) 1 else 0).toByte) ++ chars
  }

  /** Serialize a grid as a single-sheet BIFF8 .xls. Deterministic: cells
    * in row-major order, fixed record layout. */
  def write(grid: CellGrid): Array[Byte] = {
    val cellRecs = new ByteArrayOutputStream()
    grid.cells.toSeq.sortBy { case ((r, c), _) => (r, c) }.foreach { case ((r, c), v) =>
      numericStable(v) match {
        case Some(d) =>
          val num = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array()
          cellRecs.write(record(0x0203, le16(r) ++ le16(c) ++ le16(0) ++ num))
        case None =>
          cellRecs.write(record(0x0204, le16(r) ++ le16(c) ++ le16(0) ++
            xlUnicode(v, shortLen = false)))
      }
    }
    val bofGlobals = record(0x0809,
      le16(0x0600) ++ le16(0x0005) ++ le16(0x0dbb) ++ le16(0x07cc) ++ le32(0) ++ le32(0))
    val bofSheet = record(0x0809,
      le16(0x0600) ++ le16(0x0010) ++ le16(0x0dbb) ++ le16(0x07cc) ++ le32(0) ++ le32(0))
    val eof = record(0x000a, Array.emptyByteArray)
    val sheetBytes = bofSheet ++ cellRecs.toByteArray ++ eof
    // BOUNDSHEET needs the sheet BOF's absolute offset — two-pass sizing
    val name = xlUnicode("tab1", shortLen = true)
    def globals(pos: Int) =
      bofGlobals ++ record(0x0085, le32(pos) ++ le16(0) ++ name) ++ eof
    val sheetPos = globals(0).length
    val biff = globals(sheetPos) ++ sheetBytes
    cfb(biff)
  }

  /** Wrap a BIFF stream in a minimal CFB v3 container: FAT sectors,
    * one directory sector, then the Workbook stream — padded to the
    * 4096-byte mini-stream cutoff so it lives in the regular FAT.
    * private[parse]: the spec wraps hand-built record streams (SST
    * CONTINUE spans, RK/MULRK) the fixture writer never emits. */
  private[parse] def cfb(biffRaw: Array[Byte]): Array[Byte] = {
    val streamSize = math.max(4096, (biffRaw.length + 511) / 512 * 512)
    val stream = java.util.Arrays.copyOf(biffRaw, streamSize)
    val nStream = streamSize / 512
    var nFat = 1
    while (nFat * 128 < nFat + 1 + nStream) nFat += 1
    val dirSector = nFat
    val streamStart = nFat + 1
    val total = nFat + 1 + nStream
    val fat = Array.fill(nFat * 128)(FREESECT)
    for (i <- 0 until nFat) fat(i) = 0xfffffffd // FATSECT
    fat(dirSector) = ENDOFCHAIN
    for (i <- 0 until nStream)
      fat(streamStart + i) = if (i == nStream - 1) ENDOFCHAIN else streamStart + i + 1
    val out = ByteBuffer.allocate(512 + total * 512).order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    out.position(24)
    out.putShort(0x003e.toShort) // minor version
    out.putShort(0x0003.toShort) // major version 3
    out.putShort(0xfffe.toShort) // little-endian marker
    out.putShort(9.toShort)      // 512-byte sectors
    out.putShort(6.toShort)      // 64-byte mini sectors
    out.position(44)
    out.putInt(nFat)
    out.putInt(dirSector)
    out.putInt(0)
    out.putInt(4096)             // mini-stream cutoff
    out.putInt(ENDOFCHAIN)       // no mini-FAT
    out.putInt(0)
    out.putInt(ENDOFCHAIN)       // no DIFAT chain
    out.putInt(0)
    for (i <- 0 until 109)
      out.putInt(if (i < nFat) i else FREESECT)
    // FAT sectors
    fat.foreach(out.putInt)
    // directory sector: Root Entry + Workbook + two empty entries
    def dirEntry(name: String, objType: Int, child: Int, start: Int, size: Long): Unit = {
      val base = out.position()
      val n = name.getBytes("UTF-16LE")
      out.put(n)
      out.position(base + 64)
      out.putShort((if (name.isEmpty) 0 else n.length + 2).toShort)
      out.put(objType.toByte)
      out.put(1.toByte) // black
      out.putInt(FREESECT); out.putInt(FREESECT) // no siblings
      out.putInt(child)
      out.position(base + 116)
      out.putInt(start)
      out.putLong(size)
      out.position(base + 128)
    }
    dirEntry("Root Entry", 5, 1, ENDOFCHAIN, 0L)
    dirEntry("Workbook", 2, FREESECT, streamStart, streamSize.toLong)
    dirEntry("", 0, FREESECT, 0, 0L)
    dirEntry("", 0, FREESECT, 0, 0L)
    // stream sectors
    out.put(stream)
    out.array()
  }
}
