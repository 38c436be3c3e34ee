package graft

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.ingest.DocumentParser
import graft.operators.TmpDirs
import graft.serve.{HttpService, QueryService}

/** The real-file ingestion seam (VERDICT r4 ask #5): deterministic
  * binary→text parsers, the `binaryFile` directory scan, and the
  * upload route end-to-end — a directory of actual .md/.txt/.html
  * files lands in the serving store over HTTP and is searchable. */
class DocumentParserSpec extends SparkSpec {

  implicit private val formats: Formats = DefaultFormats

  test("html parser: structure survives, noise dies, entities decode") {
    val html =
      """<html><head><style>body { color: red }</style>
        |<script>alert("nope")</script></head>
        |<body><h1>Annual Report</h1>
        |<!-- draft comment -->
        |<p>Revenue &amp; margin grew&nbsp;9%.</p>
        |<ul><li>Cash &gt; debt</li><li>EPS &#39;up&#39;</li></ul>
        |</body></html>""".stripMargin
    val out = DocumentParser.HtmlParser.parse(html.getBytes("UTF-8")).text
    assert(out.contains("# Annual Report"), out)
    assert(out.contains("Revenue & margin grew 9%."))
    assert(out.contains("Cash > debt"))
    assert(out.contains("EPS 'up'"))
    assert(!out.contains("alert") && !out.contains("color: red")
      && !out.contains("draft comment") && !out.contains("<"))
    // determinism: same bytes, same text (doc ids derive from this)
    assert(out == DocumentParser.HtmlParser.parse(html.getBytes("UTF-8")).text)
  }

  test("directory scan parses known formats row-locally and drops the rest") {
    val dir = TmpDirs.create("graft_parse_dir")
    def drop(name: String, content: Array[Byte]): Unit =
      Files.write(Paths.get(dir, name), content)
    drop("notes.md", "# Notes\n\nMarkdown stays verbatim.".getBytes("UTF-8"))
    drop("plain.txt", "Plain text body.".getBytes("UTF-8"))
    drop("page.html", "<h2>Handbook</h2><p>Policy text.</p>".getBytes("UTF-8"))
    drop("table.tsv", "a\tb\n1\t2".getBytes("UTF-8"))
    drop("image.bin", Array[Byte](0, 1, 2, 3)) // no parser claims it
    // a real (minimal) docx: zip + word/document.xml
    locally {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      z.write(("""<?xml version="1.0"?><w:document """ +
        """xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        """<w:body><w:p><w:r><w:t>Contract body from word.</w:t></w:r></w:p>""" +
        """</w:body></w:document>""").getBytes("UTF-8"))
      z.closeEntry(); z.close()
      drop("contract.docx", bos.toByteArray)
    }
    // a real (minimal) pdf: one page, raw content stream
    locally {
      val content = "BT 72 720 Td (Invoice text from pdf.) Tj ET"
      drop("invoice.pdf", ("%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${content.length} >> stream\n" + content +
        "\nendstream endobj\n%%EOF\n").getBytes("ISO-8859-1"))
    }
    val rows = DocumentParser.scanDirectory(spark, dir, "org_x")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set("notes.md", "plain.txt", "page.html",
      "table.tsv", "contract.docx", "invoice.pdf"))
    assert(rows("notes.md").startsWith("# Notes"))
    assert(rows("page.html").contains("## Handbook"))
    assert(rows("page.html").contains("Policy text."))
    assert(rows("contract.docx") == "Contract body from word.")
    assert(rows("invoice.pdf") == "Invoice text from pdf.")
  }

  test("a directory of real files ingests over HTTP and is searchable") {
    val dir = TmpDirs.create("graft_upload_dir")
    Files.write(Paths.get(dir, "handbook.html"),
      ("""<html><body><h1>Employee Handbook</h1><p>Expense policy requires """ +
        """itemized receipts for reimbursement above fifty dollars.</p></body></html>""")
        .getBytes("UTF-8"))
    Files.write(Paths.get(dir, "roadmap.md"),
      "# Roadmap\n\nThe quarterly roadmap prioritizes the ingestion service rewrite."
        .getBytes("UTF-8"))

    val http = new HttpService(new QueryService(spark, TmpDirs.create("graft_upload_store")))
    http.start()
    try {
      def call(method: String, path: String, body: Option[String]): (Int, JValue) = {
        val conn = new URL(s"http://127.0.0.1:${http.port}$path")
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        conn.setRequestProperty("X-Organization-ID", "org_files")
        body.foreach { b =>
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/json")
          val os = conn.getOutputStream
          os.write(b.getBytes(StandardCharsets.UTF_8)); os.close()
        }
        val status = conn.getResponseCode
        val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
        val payload = new String(is.readAllBytes(), StandardCharsets.UTF_8)
        conn.disconnect()
        (status, parse(payload))
      }

      // upload the directory's raw bytes (multipart-equivalent b64)
      import scala.jdk.CollectionConverters._
      val docsJson = Files.list(Paths.get(dir)).iterator().asScala
        .toSeq.sortBy(_.getFileName.toString).map { p =>
          val b64 = java.util.Base64.getEncoder.encodeToString(Files.readAllBytes(p))
          s"""{"filename":"${p.getFileName}","content_b64":"$b64"}"""
        }.mkString("[", ",", "]")
      val (us, ub) = call("POST", "/documents/upload", Some(s"""{"docs":$docsJson}"""))
      assert(us == 200, ub)
      assert((ub \ "document_ids").extract[List[String]].size == 2)

      // parsed content is searchable; HTML noise did not pollute text
      val (ss, sb) = call("POST", "/search",
        Some("""{"query":"expense policy itemized receipts","limit":3}"""))
      assert(ss == 200)
      val top = (sb \ "results").extract[List[JValue]]
      assert(top.nonEmpty)
      assert((top.head \ "text").extract[String].contains("itemized receipts"))

      // unsupported binary upload is the client's 400, not a 500
      val (bs, bb) = call("POST", "/documents/upload",
        Some("""{"docs":[{"filename":"raw.bin","content_b64":"AAEC"}]}"""))
      assert(bs == 400, bb)
    } finally http.stop()
  }
}
