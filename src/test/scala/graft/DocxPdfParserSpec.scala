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
}
