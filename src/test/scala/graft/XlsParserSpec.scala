package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{DocumentParser, XlsParser}

/** Native .xls (BIFF8-in-CFBF) extraction: the fixture is a REAL
  * compound file assembled from the two format primitives — a CFBF
  * container (header / FAT / directory / stream sectors) holding a
  * BIFF8 `Workbook` stream (globals substream with an SST split
  * across a CONTINUE record mid-string, one BOUNDSHEET; a sheet
  * substream with LABELSST / NUMBER / RK / MULRK / BOOLERR / LABEL
  * cells) — so the parser is exercised on the byte layout Excel 97+
  * actually writes, not a mock. */
class XlsParserSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)

  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(data.length) ++ data

  /** BIFF8 workbook stream with a CONTINUE-split SST. */
  private def workbookStream: (Array[Byte], Int) = {
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ Array.fill[Byte](12)(0))
    // SST: 3 strings. "item" and "qty" compressed; the third,
    // "wide±str" (wide chars), starts in the SST record and CONTINUES
    // mid-string — the continuation restarts the options byte.
    val s3 = "wide±str"
    val s3a = s3.take(3) // in the SST record (wide)
    val s3b = s3.drop(3) // in the CONTINUE (wide, fresh grbit)
    def wideBytes(s: String): Array[Byte] =
      s.flatMap(c => Seq((c & 0xFF).toByte, ((c >> 8) & 0xFF).toByte)).toArray
    val sstData =
      le32(3) ++ le32(3) ++
        (le16(4) ++ Array(0x00.toByte) ++ "item".getBytes("ISO-8859-1")) ++
        (le16(3) ++ Array(0x00.toByte) ++ "qty".getBytes("ISO-8859-1")) ++
        (le16(s3.length) ++ Array(0x01.toByte) ++ wideBytes(s3a))
    val continueData = Array(0x01.toByte) ++ wideBytes(s3b)
    val sst = rec(0x00FC, sstData) ++ rec(0x003C, continueData)
    // BOUNDSHEET: patched offset; name "Data" compressed
    def boundsheet(off: Int) = rec(0x0085,
      le32(off) ++ Array(0x00.toByte, 0x00.toByte, 4.toByte, 0x00.toByte) ++
        "Data".getBytes("ISO-8859-1"))
    val eof = rec(0x000A, Array.empty)

    def cell(row: Int, col: Int, tail: Array[Byte]) =
      le16(row) ++ le16(col) ++ le16(0) ++ tail // xf = 0
    def dbl(v: Double): Array[Byte] = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(v); bb.array()
    }
    val sheet =
      rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ Array.fill[Byte](12)(0)) ++
        rec(0x00FD, cell(0, 0, le32(0))) ++ // "item"
        rec(0x00FD, cell(0, 1, le32(1))) ++ // "qty"
        rec(0x00FD, cell(0, 2, le32(2))) ++ // the CONTINUE-split string
        rec(0x027E, cell(1, 0, le32((7 << 2) | 0x02))) ++ // RK int 7
        rec(0x0203, cell(1, 1, dbl(4.0))) ++ // NUMBER 4
        rec(0x00BD, le16(2) ++ le16(0) ++ // MULRK row2 cols 0-1
          (le16(0) ++ le32(0x3FF80000 & ~3)) ++ // 1.5 as float RK
          (le16(0) ++ le32(((250 << 2) | 0x03))) ++ // 2.5 via int/100
          le16(1)) ++
        rec(0x0205, cell(3, 0, Array(0x01.toByte, 0x00.toByte))) ++ // TRUE
        rec(0x0204, cell(3, 1, le16(4) ++ Array(0x00.toByte) ++
          "note".getBytes("ISO-8859-1"))) ++ // inline LABEL
        rec(0x000A, Array.empty)

    // compute the sheet offset, then assemble with the patched value
    val fixedPrefix = bof ++ sst
    val bsLen = boundsheet(0).length
    val sheetOff = fixedPrefix.length + bsLen + eof.length
    val stream = fixedPrefix ++ boundsheet(sheetOff) ++ eof ++ sheet
    (stream.padTo(4096, 0.toByte), sheetOff)
  }

  /** Wrap a stream into a one-FAT-sector CFBF container. */
  private def cfbf(stream: Array[Byte], streamName: String): Array[Byte] = {
    val sectorSize = 512
    val nStreamSectors = (stream.length + sectorSize - 1) / sectorSize
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.putLong(0, 0xE11AB1A1E011CFD0L) // magic
    header.putShort(24, 0x003E.toShort) // minor
    header.putShort(26, 0x0003.toShort) // major 3
    header.putShort(28, 0xFFFE.toShort) // little-endian marker
    header.putShort(30, 9.toShort) // 512-byte sectors
    header.putShort(32, 6.toShort) // 64-byte mini sectors
    header.putInt(44, 1) // one FAT sector
    header.putInt(48, 1) // directory at sector 1
    header.putInt(56, 4096) // mini cutoff
    header.putInt(60, -2) // no mini FAT
    header.putInt(64, 0)
    header.putInt(68, -2) // no DIFAT chain
    header.putInt(72, 0)
    header.putInt(76, 0) // DIFAT[0] -> FAT sector 0
    for (k <- 1 until 109) header.putInt(76 + 4 * k, -1)

    val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    fat.putInt(0, -3) // FATSECT
    fat.putInt(4, -2) // directory: end of chain
    for (k <- 0 until nStreamSectors) // stream at sectors 2..
      fat.putInt(8 + 4 * k, if (k == nStreamSectors - 1) -2 else 3 + k)
    for (k <- nStreamSectors until (512 - 8) / 4) fat.putInt(8 + 4 * k, -1)

    def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      e.position(0); e.put(n)
      e.putShort(64, ((name.length + 1) * 2).toShort)
      e.put(66, typ.toByte)
      e.putInt(68, -1); e.putInt(72, -1); e.putInt(76, -1) // siblings/child
      e.putInt(116, start)
      e.putInt(120, size)
      e.array()
    }
    val dir = dirEntry("Root Entry", 5, -2, 0) ++
      dirEntry(streamName, 2, 2, stream.length) ++
      Array.fill[Byte](256)(0)

    val out = new ByteArrayOutputStream()
    out.write(header.array()); out.write(fat.array()); out.write(dir)
    out.write(stream.padTo(nStreamSectors * sectorSize, 0.toByte))
    out.toByteArray
  }

  private lazy val xlsBytes = cfbf(workbookStream._1, "Workbook")

  test("xls: CFBF + BIFF8 cells extract as a TSV sheet block") {
    val out = XlsParser.parse(xlsBytes)
    assert(out.format == "table")
    val expected =
      """## Sheet: Data
        |
        |item	qty	wide±str
        |7	4
        |1.5	2.5
        |TRUE	note""".stripMargin
    assert(out.text == expected, out.text)
    // determinism
    assert(out.text == XlsParser.parse(xlsBytes).text)
  }

  test("xls: parser chain claims .xls but not .xlsx; malformed bytes degrade to empty") {
    assert(DocumentParser.parseFile("ledger.xls", xlsBytes).exists(_.text.contains("qty")))
    assert(!XlsParser.accepts("ledger.xlsx"))
    assert(XlsParser.parse(Array.fill[Byte](100)(7)).text == "")
    assert(XlsParser.parse(xlsBytes.take(600)).text == "")
  }

  test("xls: a 'Book' stream name (BIFF8 saved by some producers) also resolves") {
    val viaBook = cfbf(workbookStream._1, "Book")
    assert(XlsParser.parse(viaBook).text.contains("item\tqty"))
  }
}
