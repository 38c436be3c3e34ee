package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable binary→text parsing seam (S1's front door, the role of
  * the reference's format dispatch in
  * `ingestion/document_processor.py:310-399`): raw file bytes in,
  * ingestable text out, so the engine can be pointed at a directory of
  * REAL files — not only pre-extracted text. Deterministic
  * implementations ship for txt / md / html (+ tsv/csv routed through
  * the delimiter-inference table path); PDF/DOCX/OCR stay behind the
  * same trait for a parser backed by a real extraction library (the
  * sanctioned out-of-scope surface — this container has no such lib,
  * and a fake extractor would pin wrong semantics).
  *
  * Scale shape: parsing is a row-local flatMap over Spark's
  * `binaryFile` source — no shuffle, no driver loop; a 100 TB document
  * lake parses as one map pass whose output feeds the same
  * [[Pipeline.ingest]] / serving-store append every other ingest path
  * uses.
  */
object DocumentParser {

  /** One parsed document: extracted text plus the detected logical
    * format (the reference's `file_type` routing tag). */
  final case class Parsed(text: String, format: String)

  /** A format parser: claims files by name, turns bytes into text.
    * Implementations MUST be deterministic (same bytes → same text) —
    * document ids derive from the text, and the store's pure-append
    * upsert contract rests on that. */
  trait Parser extends Serializable {
    def accepts(filename: String): Boolean
    def parse(bytes: Array[Byte]): Parsed
  }

  private def decodeUtf8(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)

  /** Plain text / markdown: UTF-8 decode (malformed sequences map to
    * U+FFFD — deterministic), markdown structure left intact for the
    * structure detector / hierarchical chunker downstream. */
  object TextParser extends Parser {
    def accepts(f: String): Boolean =
      f.endsWith(".txt") || f.endsWith(".md") || f.endsWith(".markdown")
    def parse(bytes: Array[Byte]): Parsed = Parsed(decodeUtf8(bytes), "txt")
  }

  /** Deterministic HTML→text: script/style/comment blocks dropped,
    * heading tags become markdown `#` prefixes (so the hierarchical
    * chunker sees the document structure the markup encoded), block
    * closers become newlines, remaining tags strip, the five basic
    * entities decode, whitespace collapses per line. A regex pass, not
    * a DOM parse — deterministic and dependency-free, the
    * `BeautifulSoup.get_text` role (`document_processor.py:376-399`). */
  object HtmlParser extends Parser {
    def accepts(f: String): Boolean =
      f.endsWith(".html") || f.endsWith(".htm")
    def parse(bytes: Array[Byte]): Parsed = {
      var s = decodeUtf8(bytes)
      s = s.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      s = s.replaceAll("(?s)<!--.*?-->", " ")
      // headings → markdown so structure survives the tag strip
      for (h <- 1 to 6)
        s = s.replaceAll(s"(?is)<h$h[^>]*>(.*?)</h$h>",
          "\n" + ("#" * h) + " $1\n")
      s = s.replaceAll("(?i)<(br|/p|/div|/li|/tr|/ul|/ol|/table)[^>]*>", "\n")
      s = s.replaceAll("(?s)<[^>]+>", " ")
      s = s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
      s = s.split('\n').map(_.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim)
        .mkString("\n").replaceAll("\n{3,}", "\n\n").trim
      Parsed(s, "html")
    }
  }

  /** Delimited tables (tsv/csv): decoded as-is — the text flows to
    * [[TableExtractor]]'s delimiter-inference path (S4), which turns
    * it into dual chunks + structured records downstream. */
  object DelimitedParser extends Parser {
    def accepts(f: String): Boolean =
      f.endsWith(".tsv") || f.endsWith(".csv")
    def parse(bytes: Array[Byte]): Parsed = Parsed(decodeUtf8(bytes), "table")
  }

  /** Native XLSX scan (S4, the role of the reference's
    * `partition_xlsx` dispatch, `document_processor.py:369-374`):
    * an .xlsx is a zip of XML parts, both readable with the JDK alone
    * — no new dependency. Each worksheet renders as a TSV block under
    * a `## Sheet: name` heading, so the output flows straight into
    * [[TableExtractor]]'s delimiter-inference path (dual chunks +
    * structured records) exactly like a hand-made TSV upload, and the
    * heading doubles as section structure for the chunker.
    *
    * Supported cell forms: shared strings (`t="s"`), inline strings
    * (`t="inlineStr"`), literal strings (`t="str"`), booleans
    * (`t="b"` → TRUE/FALSE), and numeric `<v>` passthrough. Column
    * gaps from the `r="B2"` cell refs become empty TSV cells.
    * Formatting/formulas/merged-cell geometry are out of scope (the
    * reference's `infer_table_structure` keeps cell VALUES too). */
  object XlsxParser extends Parser {
    def accepts(f: String): Boolean = f.endsWith(".xlsx")

    // per-entry decompression cap: a zip-bomb guard for the upload route
    private val MaxEntryBytes = 64 * 1024 * 1024

    def parse(bytes: Array[Byte]): Parsed = {
      val entries = readZip(bytes)
      val shared = entries.get("xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(Vector.empty)
      val names = entries.get("xl/workbook.xml")
        .map(parseSheetNames).getOrElse(Vector.empty)
      val sheetFiles = entries.keys
        .filter(_.matches("xl/worksheets/sheet\\d+\\.xml")).toSeq
        .sortBy(n => n.replaceAll("\\D", "").toInt)
      val blocks = sheetFiles.zipWithIndex.map { case (f, i) =>
        val name = names.lift(i).getOrElse(s"Sheet${i + 1}")
        s"## Sheet: $name\n\n" + sheetToTsv(entries(f), shared)
      }
      Parsed(blocks.mkString("\n\n").trim, "table")
    }

    private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = Map.newBuilder[String, Array[Byte]]
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = zin.read(tmp)
          while (n > 0) {
            if (buf.size + n > MaxEntryBytes)
              throw new IllegalArgumentException(
                s"xlsx entry ${e.getName} exceeds $MaxEntryBytes bytes")
            buf.write(tmp, 0, n); n = zin.read(tmp)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
      out.result()
    }

    private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      // no DTDs / external entities on untrusted input
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes), "UTF-8")
    }

    /** `<si>` items, each the concatenation of its `<t>` runs. */
    private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
      val r = xmlReader(bytes)
      val items = Vector.newBuilder[String]
      var current: StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => current = new StringBuilder
              case "t" => inT = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && current != null =>
            current.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => items += current.toString; current = null
              case "t" => inT = false
              case _ =>
            }
          case _ =>
        }
      }
      items.result()
    }

    /** `<sheet name="…">` attributes in workbook order. */
    private def parseSheetNames(bytes: Array[Byte]): Vector[String] = {
      val r = xmlReader(bytes)
      val names = Vector.newBuilder[String]
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet")
          names += Option(r.getAttributeValue(null, "name")).getOrElse("")
      }
      names.result()
    }

    /** "B2" → 0-based column index (letters part only). */
    private def colIndex(ref: String): Int = {
      var i = 0; var acc = 0
      while (i < ref.length && ref.charAt(i).isLetter) {
        acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
      }
      math.max(0, acc - 1)
    }

    private def sheetToTsv(bytes: Array[Byte], shared: Vector[String]): String = {
      val r = xmlReader(bytes)
      val rows = Vector.newBuilder[String]
      var cells: scala.collection.mutable.ArrayBuffer[String] = null
      var cellCol = 0
      var nextCol = 0
      var cellType = ""
      var inV = false
      var inIsT = false
      val value = new StringBuilder
      def flushCell(): Unit = if (cells != null) {
        val text = cellType match {
          case "s" => shared.lift(value.toString.trim.toInt).getOrElse("")
          case "b" => if (value.toString.trim == "1") "TRUE" else "FALSE"
          case _ => value.toString
        }
        while (cells.size < cellCol) cells += ""
        cells += text
        nextCol = cellCol + 1
        value.clear()
      }
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                cells = scala.collection.mutable.ArrayBuffer.empty[String]
                nextCol = 0
              case "c" =>
                cellCol = Option(r.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(nextCol)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                value.clear()
              case "v" => inV = true
              case "t" => inIsT = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inIsT =>
            value.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "c" => flushCell()
              case "v" => inV = false
              case "t" => inIsT = false
              case "row" =>
                if (cells != null) rows += cells.mkString("\t")
                cells = null
              case _ =>
            }
          case _ =>
        }
      }
      rows.result().mkString("\n")
    }
  }

  /** Default parser chain, first-accept-wins (the reference's
    * extension dispatch). */
  val defaultParsers: Seq[Parser] =
    Seq(TextParser, HtmlParser, DelimitedParser, XlsxParser)

  /** Parse one file; None when no parser claims it (the caller's
    * quarantine / 400 decision, mirroring the reference's
    * unsupported-type error). */
  def parseFile(filename: String, bytes: Array[Byte],
                parsers: Seq[Parser] = defaultParsers): Option[Parsed] = {
    val lower = filename.toLowerCase
    parsers.find(_.accepts(lower)).map(_.parse(bytes))
  }

  /** Directory scan → docs-shaped frame (filename, text,
    * organization_id): Spark's `binaryFile` source recursively lists
    * `dir`, each file parses row-locally in the scan stage, files no
    * parser claims are dropped (quarantine stance — a binary blob in
    * the upload directory must not kill the batch). The result feeds
    * [[graft.serve.QueryService.ingestBatch]] or [[Pipeline.ingest]]
    * directly. */
  def scanDirectory(spark: SparkSession, dir: String, org: String,
                    parsers: Seq[Parser] = defaultParsers): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseFile(name, bytes, parsers).map(p => (name, p.text, org))
      }
      .toDF("filename", "text", "organization_id")
  }
}
