package graft.ingest

import scala.collection.mutable

import graft.ingest.DocumentParser.{Parsed, Parser}

/** Native legacy-Excel (.xls, BIFF8) scan — the last text-bearing
  * format on the reference's extension list
  * (`ingestion/document_processor.py:473`: pdf, docx, txt, png, jpg,
  * xlsx, **xls**) without a parser behind the S1 seam. Pure JDK, like
  * the docx/xlsx/pdf parsers: no new dependency.
  *
  * Two public formats compose a .xls file, both implemented from
  * their specifications (MS-CFB and MS-XLS, published by Microsoft
  * under the Open Specification Promise):
  *
  *  - **CFBF** (compound file): 512-byte header, FAT-chained sectors,
  *    a directory of streams; small streams (< 4096 bytes) live in a
  *    mini-stream with its own mini-FAT. We locate the `Workbook` (or
  *    `Book`) stream.
  *  - **BIFF8** records inside that stream: the globals substream
  *    carries the shared-string table (SST, split across CONTINUE
  *    records — each continuation restarts the string-options byte,
  *    the format's notorious wrinkle) and one BOUNDSHEET per sheet
  *    (name + substream offset); each sheet substream carries cell
  *    records — LABELSST / NUMBER / RK / MULRK / LABEL / BOOLERR and
  *    FORMULA with a cached numeric or a trailing STRING result.
  *
  * Output matches [[DocumentParser.XlsxParser]]: one `## Sheet: name`
  * heading + TSV block per sheet, so the text flows into the same S4
  * table-extraction path as an .xlsx or hand-made TSV. Deterministic
  * (same bytes → same text); malformed containers degrade to empty
  * rather than throwing (quarantine stance). Number rendering matches
  * the xlsx convention: integral doubles print without a decimal
  * point (what an .xlsx stores textually for the same cell). */
object XlsParser extends Parser {

  def accepts(f: String): Boolean = f.endsWith(".xls")

  private val MaxStreamBytes = 256 * 1024 * 1024

  def parse(bytes: Array[Byte]): Parsed =
    try {
      val wb = compoundStream(bytes, Set("Workbook", "Book"))
        .getOrElse(return Parsed("", "table"))
      Parsed(workbookText(wb), "table")
    } catch {
      case scala.util.control.NonFatal(_) => Parsed("", "table")
    }

  // ------------------------------------------------------------ CFBF

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)

  /** Extract one named stream from a CFBF container (regular FAT and
    * mini-FAT paths both implemented). */
  private def compoundStream(b: Array[Byte],
                             names: Set[String]): Option[Array[Byte]] = {
    if (b.length < 512 || i32(b, 0) != 0xE011CFD0 || i32(b, 4) != 0xE11AB1A1.toInt)
      return None
    val sectorSize = 1 << u16(b, 30)
    val miniSize = 1 << u16(b, 32)
    val firstDir = i32(b, 48)
    val miniCutoff = i32(b, 56)
    val firstMiniFat = i32(b, 60)
    val firstDifat = i32(b, 68)
    val nDifat = i32(b, 72)

    def sector(sid: Int): Int = 512 + sid * sectorSize

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    for (k <- 0 until 109) {
      val sid = i32(b, 76 + 4 * k)
      if (sid >= 0) fatSectors += sid
    }
    var difat = firstDifat
    var dGuard = 0
    while (difat >= 0 && dGuard < nDifat + 4) {
      val base = sector(difat)
      for (k <- 0 until sectorSize / 4 - 1) {
        val sid = i32(b, base + 4 * k)
        if (sid >= 0) fatSectors += sid
      }
      difat = i32(b, base + sectorSize - 4)
      dGuard += 1
    }
    val fat = new mutable.ArrayBuffer[Int]()
    fatSectors.foreach { fs =>
      val base = sector(fs)
      for (k <- 0 until sectorSize / 4) fat += i32(b, base + 4 * k)
    }

    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var sid = start
      while (sid >= 0 && sid < fat.length && out.size * sectorSize < MaxStreamBytes) {
        out += sid
        sid = fat(sid)
      }
      out.toSeq
    }
    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach { sid =>
        val off = sector(sid)
        val n = math.min(sectorSize.toLong, size - out.size).toInt
        if (n > 0 && off + n <= b.length) out.write(b, off, n)
      }
      out.toByteArray
    }

    // directory entries: 128 bytes each, across the directory chain
    val dir = readChain(firstDir, Long.MaxValue)
    var rootStart = -1
    var hit: Option[(Int, Long)] = None
    var e = 0
    while (e + 128 <= dir.length) {
      val nameLen = u16(dir, e + 64)
      val typ = u8(dir, e + 66)
      if (nameLen >= 2 && typ != 0) {
        val name = new String(dir, e, nameLen - 2, "UTF-16LE")
        val start = i32(dir, e + 116)
        val size = i32(dir, e + 120).toLong & 0xFFFFFFFFL
        if (typ == 5) rootStart = start
        else if (typ == 2 && names.contains(name) && hit.isEmpty)
          hit = Some((start, size))
      }
      e += 128
    }
    hit.map { case (start, size) =>
      if (size >= miniCutoff) readChain(start, size)
      else {
        // mini-stream: root's chain holds the bytes; mini-FAT chains
        // the 64-byte mini-sectors
        val mini = readChain(rootStart, Long.MaxValue)
        val miniFat = new mutable.ArrayBuffer[Int]()
        chain(firstMiniFat).foreach { fs =>
          val base = sector(fs)
          for (k <- 0 until sectorSize / 4) miniFat += i32(b, base + 4 * k)
        }
        val out = new java.io.ByteArrayOutputStream()
        var sid = start
        var guard = 0
        while (sid >= 0 && sid < miniFat.length && out.size < size &&
               guard < miniFat.length + 1) {
          val off = sid * miniSize
          val n = math.min(miniSize.toLong, size - out.size).toInt
          if (off + n <= mini.length) out.write(mini, off, n)
          sid = miniFat(sid)
          guard += 1
        }
        out.toByteArray
      }
    }
  }

  // ----------------------------------------------------------- BIFF8

  private case class Rec(id: Int, at: Int, data: Array[Byte])

  private def records(s: Array[Byte]): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    var o = 0
    while (o + 4 <= s.length) {
      val id = u16(s, o)
      val len = u16(s, o + 2)
      if (o + 4 + len > s.length) return out.result()
      out += Rec(id, o, java.util.Arrays.copyOfRange(s, o + 4, o + 4 + len))
      o += 4 + len
    }
    out.result()
  }

  /** Cursor over a record's data plus its CONTINUE followers; string
    * reads crossing into a continuation re-read the options byte (the
    * BIFF8 split rule). */
  private final class SstCursor(parts: Seq[Array[Byte]]) {
    private var p = 0
    private var o = 0
    def crossed(): Boolean = { // advance past empty parts; true if moved
      var moved = false
      while (p < parts.length && o >= parts(p).length) { p += 1; o = 0; moved = true }
      moved
    }
    def byte(): Int = { crossed(); val v = u8(parts(p), o); o += 1; v }
    def short(): Int = { val lo = byte(); val hi = byte(); lo | (hi << 8) }
    def int(): Int = { val lo = short(); val hi = short(); lo | (hi << 16) }
    def skip(n: Int): Unit = { var k = 0; while (k < n) { byte(); k += 1 } }
    /** XLUnicodeRichExtendedString. */
    def string(): String = {
      val cch = short()
      var grbit = byte()
      val fRich = (grbit & 0x08) != 0
      val fExt = (grbit & 0x04) != 0
      val cRun = if (fRich) short() else 0
      val cbExt = if (fExt) int() else 0
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        if (crossed()) grbit = byte() // continuation restarts options
        val wide = (grbit & 0x01) != 0
        // chars available in the current part under the current width
        val avail = (parts(p).length - o) / (if (wide) 2 else 1)
        val take = math.min(cch - read, math.max(avail, 0))
        var k = 0
        while (k < take) {
          sb.append(
            if (wide) { val c = u16(parts(p), o); o += 2; c.toChar }
            else { val c = u8(parts(p), o); o += 1; c.toChar })
          k += 1
        }
        read += take
        if (take == 0 && !crossed()) return sb.toString // malformed guard
      }
      skip(cRun * 4 + cbExt)
      sb.toString
    }
  }

  private def rkValue(rk: Int): Double = {
    val mul100 = (rk & 0x01) != 0
    val isInt = (rk & 0x02) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (mul100) v / 100.0 else v
  }

  private def num(d: Double): String =
    if (d == Math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def workbookText(wb: Array[Byte]): String = {
    val recs = records(wb)
    // globals substream: SST + BOUNDSHEETs (ends at the first EOF)
    val sst = mutable.ArrayBuffer.empty[String]
    val sheets = mutable.ArrayBuffer.empty[(String, Int)] // (name, offset)
    var i = 0
    var done = false
    while (i < recs.length && !done) {
      val r = recs(i)
      r.id match {
        case 0x00FC => // SST + CONTINUEs
          val parts = mutable.ArrayBuffer(r.data)
          var j = i + 1
          while (j < recs.length && recs(j).id == 0x003C) {
            parts += recs(j).data; j += 1
          }
          val cur = new SstCursor(parts.toSeq)
          cur.int() // cstTotal
          val cUnique = cur.int()
          var k = 0
          while (k < cUnique) { sst += cur.string(); k += 1 }
        case 0x0085 => // BOUNDSHEET: offset(4) vis(1) type(1) name(short string)
          val off = i32(r.data, 0)
          val cch = u8(r.data, 6)
          val grbit = u8(r.data, 7)
          val name =
            if ((grbit & 0x01) != 0)
              new String(r.data, 8, cch * 2, "UTF-16LE")
            else new String(r.data, 8, cch, "ISO-8859-1")
          sheets += ((name, off))
        case 0x000A => done = true // EOF of globals
        case _ => ()
      }
      i += 1
    }

    val blocks = sheets.zipWithIndex.map { case ((name, off), si) =>
      s"## Sheet: ${if (name.nonEmpty) name else s"Sheet${si + 1}"}\n\n" +
        sheetTsv(recs, off, sst)
    }
    blocks.mkString("\n\n").trim
  }

  private def sheetTsv(recs: Vector[Rec], off: Int,
                       sst: mutable.ArrayBuffer[String]): String = {
    val cells = mutable.Map.empty[(Int, Int), String]
    def put(row: Int, colIdx: Int, v: String): Unit =
      cells((row, colIdx)) = v
    val start = recs.indexWhere(_.at == off)
    if (start < 0) return ""
    var i = start
    var depth = 0
    var done = false
    while (i < recs.length && !done) {
      val r = recs(i)
      val d = r.data
      r.id match {
        case 0x0809 => depth += 1 // BOF (the sheet's own, or embedded)
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x00FD => // LABELSST
          val idx = i32(d, 6)
          if (idx >= 0 && idx < sst.length) put(u16(d, 0), u16(d, 2), sst(idx))
        case 0x0203 => // NUMBER: row col xf double
          put(u16(d, 0), u16(d, 2), num(java.lang.Double.longBitsToDouble(
            (0 until 8).foldRight(0L)((k, acc) => (acc << 8) | (d(6 + k) & 0xFFL)))))
        case 0x027E => // RK
          put(u16(d, 0), u16(d, 2), num(rkValue(i32(d, 6))))
        case 0x00BD => // MULRK: row colFirst (xf+rk)* colLast
          val row = u16(d, 0); val c0 = u16(d, 2)
          val n = (d.length - 6) / 6
          for (k <- 0 until n)
            put(row, c0 + k, num(rkValue(i32(d, 4 + 6 * k + 2))))
        case 0x0204 => // LABEL (inline string cell)
          val row = u16(d, 0); val c = u16(d, 2)
          val cch = u16(d, 6)
          val grbit = u8(d, 8)
          val s =
            if ((grbit & 0x01) != 0) new String(d, 9, cch * 2, "UTF-16LE")
            else new String(d, 9, cch, "ISO-8859-1")
          put(row, c, s)
        case 0x0205 => // BOOLERR
          if (u8(d, 7) == 0) put(u16(d, 0), u16(d, 2),
            if (u8(d, 6) != 0) "TRUE" else "FALSE")
        case 0x0006 => // FORMULA: cached double unless the 0xFFFF tags
          val row = u16(d, 0); val c = u16(d, 2)
          if (u16(d, 12) == 0xFFFF) {
            // string result arrives in the next STRING record. The spec
            // places it IMMEDIATELY after FORMULA, optionally separated
            // by a SHRFMLA/ARRAY/TABLE record — so only accept a STRING
            // within the next 3 records; an unbounded forward scan on a
            // malformed file missing its STRING would bind a LATER
            // formula's (or a later sheet's) string and attribute the
            // wrong text to this cell, instead of degrading to empty.
            if (u8(d, 6) == 0 && i + 1 < recs.length) {
              val nx = recs.indexWhere(x => x.id == 0x0207, i + 1)
              if (nx > 0 && nx <= i + 3) {
                val sd = recs(nx).data
                val cch = u16(sd, 0)
                val grbit = u8(sd, 2)
                val s =
                  if ((grbit & 0x01) != 0) new String(sd, 3, cch * 2, "UTF-16LE")
                  else new String(sd, 3, cch, "ISO-8859-1")
                put(row, c, s)
              }
            } else if (u8(d, 6) == 1) // cached boolean
              put(row, c, if (u8(d, 8) != 0) "TRUE" else "FALSE")
          } else
            put(row, c, num(java.lang.Double.longBitsToDouble(
              (0 until 8).foldRight(0L)((k, acc) => (acc << 8) | (d(6 + k) & 0xFFL)))))
        case _ => ()
      }
      i += 1
    }
    if (cells.isEmpty) return ""
    val maxRow = cells.keys.map(_._1).max
    val maxCol = cells.keys.map(_._2).max
    (0 to maxRow).map { r =>
      (0 to maxCol).map(c => cells.getOrElse((r, c), "")).mkString("\t")
        .replaceAll("\\s+$", "")
    }.filter(_.nonEmpty).mkString("\n")
  }
}
