package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{DocumentParser, TableExtractor}

/** Native DOCX + PDF text extraction (S1 front door — the reference's
  * `partition`/`partition_pdf` dispatch, `document_processor.py:
  * 337-380`): fixtures are REAL files of each format assembled from
  * the format primitives (zip+OOXML for docx; object/xref-less PDF
  * body with raw and FlateDecode content streams), so the parsers are
  * exercised on the byte layouts producers actually emit, not on a
  * mock. Pure driver-side, no SparkSession. */
class DocxPdfParserSpec extends AnyFunSuite {

  // ---------------------------------------------------------- docx --

  private def docx(documentXml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    for ((name, content) <- Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""",
      "word/document.xml" -> documentXml)) {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val documentXml =
    """<?xml version="1.0"?>
      |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
      |<w:body>
      |<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>Services Agreement</w:t></w:r></w:p>
      |<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>1. Payment</w:t></w:r></w:p>
      |<w:p><w:r><w:t>Net 30 </w:t></w:r><w:r><w:t>days from invoice.</w:t></w:r></w:p>
      |<w:p><w:r><w:t>Ref</w:t><w:tab/><w:t>A-17</w:t></w:r></w:p>
      |<w:tbl>
      |<w:tr><w:tc><w:p><w:r><w:t>item</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>qty</w:t></w:r></w:p></w:tc></w:tr>
      |<w:tr><w:tc><w:p><w:r><w:t>bolt</w:t></w:r></w:p><w:p><w:r><w:t>(steel)</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>4</w:t></w:r></w:p></w:tc></w:tr>
      |</w:tbl>
      |<w:p><w:r><w:t>Signed.</w:t></w:r></w:p>
      |</w:body>
      |</w:document>""".stripMargin

  private val docxBytes = docx(documentXml)

  test("docx: headings → markdown, runs/tabs join, tables → TSV blocks") {
    val out = DocumentParser.DocxParser.parse(docxBytes)
    assert(out.format == "docx")
    val expected =
      """# Services Agreement
        |
        |## 1. Payment
        |
        |Net 30 days from invoice.
        |
        |Ref	A-17
        |
        |item	qty
        |bolt (steel)	4
        |
        |Signed.""".stripMargin
    assert(out.text == expected, out.text)
    assert(out.text == DocumentParser.DocxParser.parse(docxBytes).text)
  }

  test("docx: parser chain claims it and the table block feeds S4") {
    val parsed = DocumentParser.parseFile("msa_2024.docx", docxBytes)
    assert(parsed.isDefined && parsed.get.format == "docx")
    assert(TableExtractor.detect(parsed.get.text).nonEmpty)
  }

  // ----------------------------------------------------------- pdf --

  private def deflate(s: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Two-page PDF: page 1 raw content stream (Tj, escapes, TJ kerning
    * array, hex string), page 2 FlateDecode. No xref table — readers
    * that reconstruct from `N 0 obj` markers (as ours does) accept
    * this, and every real producer writes the markers. */
  private def pdfBytes: Array[Byte] = {
    val content1 =
      "BT /F1 12 Tf 72 720 Td (Master Services Agreement) Tj " +
        "0 -20 Td (Payment terms: net \\(30\\) days \\101SAP.) Tj " +
        "0 -20 Td [(Hel) -30 (lo) 10 ( wor) (ld)] TJ " +
        "0 -20 Td <48657821> Tj ET"
    val content2raw = "BT 72 720 Td (Second page body.) Tj ET"
    val content2 = deflate(content2raw.getBytes("ISO-8859-1"))
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content1.length} >> stream\n")
    w(content1)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${content2.length} /Filter /FlateDecode >> stream\n")
    bos.write(content2)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf: Tj/TJ/hex/escapes extract in order; Flate pages inflate") {
    val out = DocumentParser.PdfParser.parse(pdfBytes)
    assert(out.format == "pdf")
    val expected =
      """Master Services Agreement
        |Payment terms: net (30) days ASAP.
        |Hello world
        |Hex!
        |
        |Second page body.""".stripMargin
    assert(out.text == expected, out.text)
    assert(out.text == DocumentParser.PdfParser.parse(pdfBytes).text)
  }

  test("pdf: parser chain claims it; a truncated stream yields empty, not a crash") {
    assert(DocumentParser.parseFile("contract.pdf", pdfBytes).isDefined)
    val truncated = pdfBytes.take(pdfBytes.length / 2)
    // quarantine stance: malformed input degrades to whatever objects
    // parsed, never throws from a bad deflate
    DocumentParser.PdfParser.parse(truncated)
  }

  /** PDF 1.5 compressed layout: the page dictionary lives INSIDE a
    * FlateDecode /ObjStm, the file carries a binary /XRef stream, and
    * a content string is UTF-16BE with BOM. Real "modern producer"
    * shape (every object except streams compressed). */
  private def pdf15Bytes: Array[Byte] = {
    // object stream holding objects 1 (catalog), 2 (pages), 3 (page)
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val bodies = Seq(1 -> o1, 2 -> o2, 3 -> o3)
    var off = 0
    val header = bodies.map { case (num, b) =>
      val h = s"$num $off"; off += b.length + 1; h
    }.mkString(" ") + "\n"
    val payload = header + bodies.map(_._2).mkString("\n") + "\n"
    val objStm = deflate(payload.getBytes("ISO-8859-1"))
    // UTF-16BE literal with BOM: "Héllo §2" exercises non-latin units
    val utf16 = "þÿ" + "Héllo §2".toSeq.flatMap(c =>
      Seq((c >> 8).toChar, (c & 0xFF).toChar)).mkString
    val content = s"BT 72 720 Td ($utf16) Tj 0 -20 Td (plain ascii line) Tj ET"
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"7 0 obj << /Type /ObjStm /N 3 /First ${header.length} /Length ${objStm.length} /Filter /FlateDecode >> stream\n")
    bos.write(objStm)
    w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content)
    w("\nendstream endobj\n")
    // binary xref stream: must be ignored, never leak into text
    w("8 0 obj << /Type /XRef /W [1 2 1] /Size 9 /Length 12 >> stream\n")
    bos.write(Array.tabulate[Byte](12)(i => (i * 37).toByte))
    w("\nendstream endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf 1.5: page dict inside /ObjStm parses; /XRef stream is inert; UTF-16BE literals decode") {
    val out = DocumentParser.PdfParser.parse(pdf15Bytes)
    assert(out.text == "Héllo §2\nplain ascii line", out.text)
    // determinism
    assert(out.text == DocumentParser.PdfParser.parse(pdf15Bytes).text)
  }

  /** Composite-font (Type0 / Identity-H) PDF with a /ToUnicode CMap:
    * hex strings are CIDs and must decode through the map (bfchar +
    * bfrange forms), never byte-per-char. */
  private def pdfCidBytes(withCmap: Boolean): Array[Byte] = {
    val cmapData =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |2 beginbfchar
        |<0001> <0043>
        |<0002> <0049>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0044>
        |endbfrange
        |endcmap
        |""".stripMargin
    val content = "BT /F1 12 Tf 72 720 Td <00010002> Tj 0 -20 Td <001000110012> Tj ET"
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H" +
      (if (withCmap) " /ToUnicode 6 0 R" else "") + " >> endobj\n")
    if (withCmap) {
      w(s"6 0 obj << /Length ${cmapData.length} >> stream\n")
      w(cmapData)
      w("\nendstream endobj\n")
    }
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf CID: hex strings decode through the ToUnicode CMap (bfchar + bfrange)") {
    val out = DocumentParser.PdfParser.parse(pdfCidBytes(withCmap = true))
    // <0001><0002> → C I; <0010><0011><0012> → D E F via the range
    assert(out.text == "CI\nDEF", out.text)
  }

  test("pdf CID without a ToUnicode map degrades to empty, not byte garbage") {
    val out = DocumentParser.PdfParser.parse(pdfCidBytes(withCmap = false))
    assert(out.text == "", out.text)
  }

  /** One page mixing a 1-byte TrueType font (/F1) with a 2-byte Type0
    * font (/F2) whose ToUnicode CMap ALSO contains the 16-bit codes
    * the simple font's hex string would form if misread 2-bytewise
    * (0x4142/0x4344 → arrows) — the adversarial case a file-global
    * map decodes as plausible-looking garbage. Per-text-object Tf
    * resolution must decode each string by its own font. */
  private def pdfMixedFontBytes: Array[Byte] = {
    val cmapData =
      """begincmap
        |4 beginbfchar
        |<0001> <65E5>
        |<0002> <672C>
        |<4142> <2190>
        |<4344> <2192>
        |endbfchar
        |endcmap
        |""".stripMargin
    val content =
      "BT /F1 12 Tf 72 720 Td <41424344> Tj 0 -20 Td (Plain latin) Tj " +
        "/F2 12 Tf 0 -20 Td <00010002> Tj 0 -20 Td (\\000\\001\\000\\002) Tj ET"
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources 9 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content)
    w("\nendstream endobj\n")
    w("9 0 obj << /Font << /F1 10 0 R /F2 11 0 R >> >> endobj\n")
    w("10 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w("11 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 12 0 R >> endobj\n")
    w(s"12 0 obj << /Length ${cmapData.length} >> stream\n")
    w(cmapData)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf mixed fonts: each text object decodes by its own Tf font (1-byte vs Type0)") {
    val out = DocumentParser.PdfParser.parse(pdfMixedFontBytes)
    // /F1 hex = byte-per-char ABCD (NOT the ← → the global map holds
    // for those 16-bit codes); /F2 hex AND literal = CIDs through its
    // own CMap → 日本
    assert(out.text == "ABCD\nPlain latin\n日本\n日本", out.text)
    assert(out.text == DocumentParser.PdfParser.parse(pdfMixedFontBytes).text)
  }

  // marked-content noise around Tf: BDC's tag name (/F1 — deliberately
  // a KNOWN font name) and a property dict's /MCID must never leak
  // into font selection; a spec-violating name-less Tf keeps the
  // current font instead of adopting the stale tag
  private def pdfMarkedContentBytes: Array[Byte] = {
    val cmapData =
      """begincmap
        |2 beginbfchar
        |<0001> <65E5>
        |<0002> <672C>
        |endbfchar
        |endcmap
        |""".stripMargin
    val content =
      "BT /F2 12 Tf 72 720 Td <00010002> Tj " +
        // tag named like a real font + a dict name, then a MALFORMED
        // name-less Tf: the pre-r11 heuristic decoded the next string
        // through /F1 (the "most recent name"), garbling the CIDs
        "/F1 <</MCID 0>> BDC 0 -20 Td 14 Tf <00010002> Tj EMC " +
        // a well-formed text object after the noise still switches
        "/F1 10 Tf 0 -20 Td (plain tail) Tj ET"
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources 9 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content)
    w("\nendstream endobj\n")
    w("9 0 obj << /Font << /F1 10 0 R /F2 11 0 R >> >> endobj\n")
    w("10 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w("11 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 12 0 R >> endobj\n")
    w(s"12 0 obj << /Length ${cmapData.length} >> stream\n")
    w(cmapData)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf marked content: tag/dict names never leak into Tf font selection") {
    val out = DocumentParser.PdfParser.parse(pdfMarkedContentBytes)
    // both CID strings decode through /F2 (the current font survives
    // the name-less Tf); the trailing object's real /F1 Tf still works
    assert(out.text == "日本\n日本\nplain tail", out.text)
  }

  // pdflatex-style split page content: /Contents holds an ARRAY of
  // stream refs, in reading order
  private def pdfArrayContentsBytes: Array[Byte] = {
    val c1 = "BT /F1 12 Tf 72 720 Td (First fragment.) Tj ET"
    val c2 = "BT 72 700 Td (Second fragment.) Tj ET"
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n")
    w(c1)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Length ${c2.length} >> stream\n")
    w(c2)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf: /Contents array form extracts every fragment in order") {
    val out = DocumentParser.PdfParser.parse(pdfArrayContentsBytes)
    assert(out.text == "First fragment.\n\nSecond fragment.", out.text)
  }
}
