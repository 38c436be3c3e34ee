package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable binary→text parsing seam (S1's front door, the role of
  * the reference's format dispatch in
  * `ingestion/document_processor.py:310-399`): raw file bytes in,
  * ingestable text out, so the engine can be pointed at a directory of
  * REAL files — not only pre-extracted text. Deterministic
  * implementations ship for txt / md / html / xlsx / docx / pdf
  * (+ tsv/csv routed through the delimiter-inference table path), all
  * pure-JDK. OCR / scanned-image layout (the reference's `hi_res`
  * unstructured strategy) stays behind the same trait for a parser
  * backed by a real vision model — the sanctioned out-of-scope
  * surface; the PDF path here is the text-layer `strategy="fast"`
  * role.
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
      val entries = readZipEntries(bytes)
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

    private[ingest] def readZipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
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

    private[ingest] def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
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

  /** Native DOCX scan (the reference accepts `.docx` via
    * `unstructured.partition`, `document_processor.py:376-380,473`):
    * a .docx is a zip whose `word/document.xml` holds the body — both
    * readable with the JDK alone. Paragraph styles `Heading1..6` /
    * `Title` render as markdown `#` prefixes (structure survives for
    * the hierarchical chunker, same convention as [[HtmlParser]]);
    * tables render as TSV blocks feeding [[TableExtractor]]'s
    * delimiter-inference path; `<w:tab/>` → TAB, `<w:br/>` → newline.
    * Formatting/images/footnotes are out of scope — the reference's
    * partition keeps text content too. */
  object DocxParser extends Parser {
    def accepts(f: String): Boolean = f.endsWith(".docx")

    def parse(bytes: Array[Byte]): Parsed = {
      val entries = XlsxParser.readZipEntries(bytes)
      val doc = entries.getOrElse("word/document.xml",
        throw new IllegalArgumentException("docx: no word/document.xml"))
      Parsed(extractBody(doc), "docx")
    }

    private def headingPrefix(style: String): String = style match {
      case "Title" => "# "
      case s if s.startsWith("Heading") && s.length == 8 && s.charAt(7).isDigit =>
        ("#" * (s.charAt(7) - '0')) + " "
      case _ => ""
    }

    private def extractBody(bytes: Array[Byte]): String = {
      import javax.xml.stream.XMLStreamConstants._
      val r = XlsxParser.xmlReader(bytes)
      val blocks = Vector.newBuilder[String]
      // paragraph state (also used for paragraphs nested in table cells)
      var para: StringBuilder = null
      var paraStyle = ""
      var inT = false
      // table state: one level (word nests tables rarely; inner tables
      // flatten into the enclosing cell, which keeps output total)
      var tableDepth = 0
      var rows: scala.collection.mutable.ArrayBuffer[String] = null
      var cells: scala.collection.mutable.ArrayBuffer[String] = null
      var cellParas: scala.collection.mutable.ArrayBuffer[String] = null
      def endPara(): Unit = if (para != null) {
        val text = headingPrefix(paraStyle) + para.toString.trim
        if (cellParas != null) { if (text.nonEmpty) cellParas += text }
        else if (text.nonEmpty) blocks += text
        para = null; paraStyle = ""
      }
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT =>
            r.getLocalName match {
              case "p" => para = new StringBuilder; paraStyle = ""
              case "pStyle" if para != null =>
                paraStyle = Option(r.getAttributeValue(null, "val")).getOrElse("")
              case "t" => inT = true
              case "tab" if para != null => para.append('\t')
              case "br" if para != null => para.append('\n')
              case "tbl" =>
                tableDepth += 1
                if (tableDepth == 1)
                  rows = scala.collection.mutable.ArrayBuffer.empty[String]
              case "tr" if tableDepth == 1 =>
                cells = scala.collection.mutable.ArrayBuffer.empty[String]
              case "tc" if tableDepth == 1 =>
                cellParas = scala.collection.mutable.ArrayBuffer.empty[String]
              case _ =>
            }
          case CHARACTERS if inT && para != null => para.append(r.getText)
          case END_ELEMENT =>
            r.getLocalName match {
              case "p" => endPara()
              case "t" => inT = false
              case "tc" if tableDepth == 1 =>
                if (cells != null && cellParas != null)
                  cells += cellParas.mkString(" ")
                cellParas = null
              case "tr" if tableDepth == 1 =>
                if (rows != null && cells != null) rows += cells.mkString("\t")
                cells = null
              case "tbl" =>
                if (tableDepth == 1 && rows != null) {
                  blocks += rows.mkString("\n"); rows = null
                }
                tableDepth = math.max(0, tableDepth - 1)
              case _ =>
            }
          case _ =>
        }
      }
      blocks.result().mkString("\n\n").trim
    }
  }

  /** Minimal native PDF text extraction (the reference routes `.pdf`
    * through `partition_pdf`, `document_processor.py:337-367`; its
    * hi-res OCR/layout model is the sanctioned out-of-scope surface —
    * this is the `strategy="fast"` text-layer role): PDF objects are
    * scanned from the raw bytes, page content streams are located via
    * each page's `/Contents` reference, FlateDecode streams inflate
    * with `java.util.zip.Inflater` (the only filter emitted by the
    * dominant text-PDF producers; other filters are skipped, not
    * guessed at), and text shows as the concatenation of `Tj`/`TJ`/
    * `'` operator strings in content order with `Td/TD/T*` treated as
    * line breaks. Octal/backslash escapes and hex strings decode;
    * strings route by the font each text object's `Tf` selects
    * (resolved from the page's `/Resources → /Font` dict): 1-byte
    * fonts read byte-per-char (Latin-1 ≈ PDFDocEncoding), Type0 /
    * Identity-H composite fonts decode 2-byte CIDs through their own
    * /ToUnicode CMap (no CMap → degrade to empty, never glyph-id
    * garbage). Deterministic: same bytes, same text. */
  object PdfParser extends Parser {
    def accepts(f: String): Boolean = f.endsWith(".pdf")

    private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    private val MaxInflatedBytes = 64 * 1024 * 1024

    def parse(bytes: Array[Byte]): Parsed = {
      val raw = new String(bytes, Latin1) // 1:1 byte↔char, offsets align
      // object table: "N G obj ... endobj" → (num → body span). The
      // scan is marker-based, so cross-reference STREAMS (PDF 1.5+
      // /Type /XRef binary streams) are simply irrelevant: we never
      // consult an xref, and an XRef object carries no /Type /Page so
      // its binary payload can't leak into text.
      val objRe = java.util.regex.Pattern.compile(
        "(?s)(\\d+)\\s+\\d+\\s+obj\\b(.*?)endobj")
      val m = objRe.matcher(raw)
      val objs = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      while (m.find()) objs.getOrElseUpdate(m.group(1).toInt, m.group(2))
      // object streams (PDF 1.5+ /Type /ObjStm): compressed PDFs keep
      // page/font dictionaries INSIDE a Flate stream — expand them
      // into the table (content streams themselves may not live in an
      // ObjStm per spec, so they are always found by the marker scan)
      expandObjectStreams(objs)
      // composite-font text support: a /ToUnicode CMap (bfchar/
      // bfrange) maps 2-byte CIDs to text; with Type0/Identity-H fonts
      // and NO CMap, hex-string CIDs degrade to empty rather than
      // decoding as byte garbage
      val cmap = toUnicodeCmap(objs)
      val composite = raw.contains("/Type0") || raw.contains("Identity-H")
      // pages in object order (a full page-tree walk needs /Kids
      // recursion; object order matches authoring order for the
      // single-producer PDFs this targets)
      val pages = objs.toSeq.filter(_._2.contains("/Type /Page")).filterNot(_._2.contains("/Pages"))
      // /Contents comes in two shapes: a single ref (`/Contents 5 0 R`)
      // and an ARRAY of refs (`/Contents [5 0 R 6 0 R]`, pdflatex and
      // other split-stream producers) — match both, refs in order
      val contentsRe = java.util.regex.Pattern.compile(
        "/Contents\\s+(\\d+)\\s+\\d+\\s+R|/Contents\\s*\\[((?:\\s*\\d+\\s+\\d+\\s+R)+)\\s*\\]")
      val arrayRefRe = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+R")
      val cmapMemo = scala.collection.mutable.HashMap.empty[Int, Map[Int, String]]
      val texts = pages.flatMap { case (_, body) =>
        val fonts = pageFonts(objs, body, cmapMemo)
        val cm = contentsRe.matcher(body)
        val refs = Iterator.continually(cm).takeWhile(_.find()).flatMap { m =>
          if (m.group(1) != null) Iterator.single(m.group(1).toInt)
          else {
            val am = arrayRefRe.matcher(m.group(2))
            Iterator.continually(am).takeWhile(_.find()).map(_.group(1).toInt)
          }
        }.toSeq
        refs.flatMap(n => objs.get(n)).map(streamData)
          .map(extractTextOps(_, fonts, cmap, composite))
      }
      Parsed(texts.map(_.trim).filter(_.nonEmpty).mkString("\n\n").trim, "pdf")
    }

    /** Inline the objects packed in `/Type /ObjStm` streams: the
      * decoded stream is `N` (objnum, byte-offset) integer pairs, then
      * the object bodies starting at `/First`. Malformed headers and
      * out-of-range offsets skip the stream (degrade, never throw). */
    private def expandObjectStreams(
        objs: scala.collection.mutable.LinkedHashMap[Int, String]): Unit = {
      val firstRe = java.util.regex.Pattern.compile("/First\\s+(\\d+)")
      val nRe = java.util.regex.Pattern.compile("/N\\s+(\\d+)")
      for (body <- objs.values.toSeq if body.contains("/ObjStm")) {
        val data = streamData(body)
        val fm = firstRe.matcher(body)
        val nm = nRe.matcher(body)
        if (data.nonEmpty && fm.find() && nm.find()) {
          val first = fm.group(1).toInt
          val cnt = nm.group(1).toInt
          if (first > 0 && first <= data.length) {
            val header = data.substring(0, first).trim
              .split("\\s+").filter(_.nonEmpty)
            val pairs = header.grouped(2).take(cnt).collect {
              case Array(a, b) if a.forall(_.isDigit) && b.forall(_.isDigit) =>
                (a.toInt, b.toInt)
            }.toSeq
            for (((num, off), idx) <- pairs.zipWithIndex) {
              val s = first + off
              val e =
                if (idx + 1 < pairs.length) first + pairs(idx + 1)._2
                else data.length
              if (s >= first && s <= e && e <= data.length)
                objs.getOrElseUpdate(num, data.substring(s, e))
            }
          }
        }
      }
    }

    /** What the content-stream scanner needs to know about one
      * resource font: whether its strings are 2-byte CID codes
      * (Type0 / Identity-H) and its own /ToUnicode map (possibly
      * empty). Resolved per page so a file mixing a 1-byte Helvetica
      * with a 2-byte CJK subset decodes each text object by the font
      * its `Tf` selected — the file-global printable-ratio heuristic
      * below remains only the fallback for PDFs that carry no usable
      * /Font resources (`document_processor.py:176-217` trusts
      * pdfminer for the same resolution). */
    private case class FontInfo(composite: Boolean, cmap: Map[Int, String])

    /** Balanced `<< … >>` starting at the first `<<` at/after `from`
      * (PDF dicts nest; regex can't close them). */
    private def dictAfter(s: String, from: Int): Option[String] = {
      val start = s.indexOf("<<", from)
      if (start < 0) return None
      var depth = 0
      var i = start
      while (i < s.length) {
        if (s.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (s.startsWith(">>", i)) {
          depth -= 1; i += 2
          if (depth == 0) return Some(s.substring(start, i))
        } else i += 1
      }
      None
    }

    /** The value of dict key `key` in `s` as either an inline dict or
      * a followed indirect reference — the two shapes `/Resources`
      * and `/Font` take in practice. */
    private def dictValue(s: String, key: String,
        objs: scala.collection.mutable.LinkedHashMap[Int, String]): Option[String] = {
      val at = s.indexOf(key)
      if (at < 0) return None
      var i = at + key.length
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (s.startsWith("<<", i)) dictAfter(s, i)
      else {
        val refRe = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+R")
        val rm = refRe.matcher(s)
        rm.region(i, s.length)
        if (rm.lookingAt()) objs.get(rm.group(1).toInt) else None
      }
    }

    /** Page body → font-resource map: name (sans `/`) → [[FontInfo]].
      * `/Resources` (inline or ref) → `/Font` (inline or ref) → one
      * entry per `/Fn N 0 R`; each font's 2-byte-ness comes from its
      * own `/Subtype /Type0` / `Identity-H`, its map from its own
      * `/ToUnicode` stream. Unresolvable pieces drop (fallback world
      * handles them), never throw. */
    private def pageFonts(
        objs: scala.collection.mutable.LinkedHashMap[Int, String],
        pageBody: String,
        // per-file memo of parsed /ToUnicode maps by OBJECT NUMBER:
        // pages routinely share fonts, and re-inflating + re-scanning
        // the same CMap stream per page is O(pages × fonts) redundant
        // work on large documents
        cmapMemo: scala.collection.mutable.HashMap[Int, Map[Int, String]])
        : Map[String, FontInfo] = {
      val fontDict = dictValue(pageBody, "/Resources", objs)
        .flatMap(res => dictValue(res, "/Font", objs))
        .getOrElse(return Map.empty)
      val entryRe = java.util.regex.Pattern.compile(
        "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R")
      val em = entryRe.matcher(fontDict)
      val out = Map.newBuilder[String, FontInfo]
      while (em.find()) {
        objs.get(em.group(2).toInt).foreach { fontBody =>
          val comp = fontBody.contains("/Type0") || fontBody.contains("Identity-H")
          val tuRe = java.util.regex.Pattern.compile(
            "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R")
          val tm = tuRe.matcher(fontBody)
          val fcmap =
            if (tm.find()) {
              val tuObj = tm.group(1).toInt
              cmapMemo.getOrElseUpdate(tuObj,
                objs.get(tuObj).map { o =>
                  val m = scala.collection.mutable.LinkedHashMap.empty[Int, String]
                  parseCmapInto(streamData(o), m)
                  m.toMap
                }.getOrElse(Map.empty[Int, String]))
            } else Map.empty[Int, String]
          out += em.group(1) -> FontInfo(comp, fcmap)
        }
      }
      out.result()
    }

    /** Union of every /ToUnicode CMap in the file: 2-byte source code →
      * text (UTF-16BE destination code units). Handles `beginbfchar`
      * pairs and `beginbfrange` with a scalar destination start; the
      * array-destination range form contributes its listed entries.
      * Single-font exports (the dominant composite-font producer
      * shape) have exactly one map; multi-font files merge first-wins.
      * This union is the FALLBACK map for text objects whose font the
      * per-page resolver couldn't name. */
    private def toUnicodeCmap(
        objs: scala.collection.mutable.LinkedHashMap[Int, String]): Map[Int, String] = {
      val out = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      for (body <- objs.values.toSeq if body.contains("stream"))
        parseCmapInto(streamData(body), out)
      out.toMap
    }

    /** bfchar/bfrange sections of one decoded CMap stream → `out`
      * (first mapping wins, matching the historical union order). */
    private def parseCmapInto(d: String,
        out: scala.collection.mutable.LinkedHashMap[Int, String]): Unit = {
      def hexChars(h: String): String = {
        val sb = new StringBuilder
        var k = 0
        while (k + 4 <= h.length) {
          try sb.append(Integer.parseInt(h.substring(k, k + 4), 16).toChar)
          catch { case _: NumberFormatException => }
          k += 4
        }
        sb.toString
      }
      val charRe = java.util.regex.Pattern.compile(
        "<([0-9A-Fa-f]{1,4})>\\s*<([0-9A-Fa-f]+)>")
      val rangeRe = java.util.regex.Pattern.compile(
        "<([0-9A-Fa-f]{1,4})>\\s*<([0-9A-Fa-f]{1,4})>\\s*<([0-9A-Fa-f]+)>")
      val sectRe = java.util.regex.Pattern.compile(
        "(?s)begin(bfchar|bfrange)(.*?)end\\1")
      if (d.contains("beginbfchar") || d.contains("beginbfrange")) {
        val sm = sectRe.matcher(d)
        while (sm.find()) {
          val section = sm.group(2)
          if (sm.group(1) == "bfrange") {
            val rm = rangeRe.matcher(section)
            while (rm.find()) {
              val lo = Integer.parseInt(rm.group(1), 16)
              val hi = Integer.parseInt(rm.group(2), 16)
              val dst = rm.group(3)
              if (hi >= lo && hi - lo < 65536 && dst.length >= 4) {
                val base = Integer.parseInt(dst.takeRight(4), 16)
                val prefix = hexChars(dst.dropRight(4))
                var c = lo
                while (c <= hi) {
                  out.getOrElseUpdate(c, prefix + (base + (c - lo)).toChar)
                  c += 1
                }
              }
            }
          } else {
            val cm = charRe.matcher(section)
            while (cm.find())
              out.getOrElseUpdate(Integer.parseInt(cm.group(1), 16),
                hexChars(cm.group(2)))
          }
        }
      }
    }

    /** Stream object body → decoded bytes-as-latin1 (inflating
      * FlateDecode; raw passthrough when no filter). */
    private def streamData(body: String): String = {
      val si = body.indexOf("stream")
      if (si < 0) return ""
      var start = si + "stream".length
      if (start < body.length && body.charAt(start) == '\r') start += 1
      if (start < body.length && body.charAt(start) == '\n') start += 1
      val end = body.indexOf("endstream", start)
      if (end < 0) return ""
      val data = body.substring(start, end).getBytes(Latin1)
      if (!body.substring(0, si).contains("/FlateDecode"))
        return new String(data, Latin1)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) return "" // truncated/dict-needed
          if (out.size + n > MaxInflatedBytes)
            throw new IllegalArgumentException("pdf stream exceeds inflate cap")
          out.write(buf, 0, n)
        }
        new String(out.toByteArray, Latin1)
      } catch {
        case _: java.util.zip.DataFormatException => ""
      } finally inf.end()
    }

    /** PDF text string → reader text: UTF-16BE strings carry the
      * FE FF byte-order mark (PDF 32000 §7.9.2.2) and decode as
      * big-endian code-unit pairs; anything else stays byte-per-char
      * (PDFDocEncoding ≈ Latin-1 for the printable range). */
    private def decodeText(s: String): String =
      if (s.length >= 2 && s.charAt(0) == 0xFE.toChar && s.charAt(1) == 0xFF.toChar) {
        val sb = new StringBuilder
        var i = 2
        while (i + 1 < s.length) {
          sb.append((((s.charAt(i) & 0xFF) << 8) | (s.charAt(i + 1) & 0xFF)).toChar)
          i += 2
        }
        sb.toString
      } else s

    /** Content stream → visible text: literal `(…)` and hex `<…>`
      * strings feeding Tj / ' / TJ, with Td/TD/T* as line breaks.
      * Strings route by the font the text object's `Tf` selected
      * (tracked against the page's resolved `fonts`): a 2-byte
      * (Type0) font decodes through ITS ToUnicode map (unmapped codes
      * drop; no map at all → empty — CIDs are font-local glyph ids,
      * and the degrade stance is empty-not-wrong), a 1-byte font
      * decodes byte-per-char through its own map when it has one.
      * Text with no resolvable font falls back to the file-global
      * world: the unioned `cmap` as 2-byte codes when non-empty, with
      * a printable-ratio escape hatch for simple-font hex strings,
      * EMPTY when the file is composite with no map, byte-per-char
      * otherwise. */
    private def extractTextOps(content: String,
                               fonts: Map[String, FontInfo],
                               cmap: Map[Int, String],
                               composite: Boolean): String = {
      val out = new StringBuilder
      var i = 0
      val n = content.length
      var lastString: String = null
      var lastName: String = null   // most recent /Name token (Tf operand)
      var curFont: FontInfo = null  // font selected by the last Tf, if resolved
      // decode a hex string as 2-byte codes through `m`; unmapped drop
      def decode2byte(hex: String, m: Map[Int, String]): String = {
        val padded = if (hex.length % 4 == 0) hex else hex + "0" * (4 - hex.length % 4)
        val sb = new StringBuilder
        var k = 0
        while (k + 4 <= padded.length) {
          try m.get(Integer.parseInt(padded.substring(k, k + 4), 16)).foreach(sb.append)
          catch { case _: NumberFormatException => }
          k += 4
        }
        sb.toString
      }
      // map a decoded 1-byte-per-char string through a simple font's
      // ToUnicode (char code → text); unmapped codes keep their byte
      def mapSimple(s: String, m: Map[Int, String]): String =
        if (m.isEmpty) s
        else s.flatMap(c => m.getOrElse(c.toInt, c.toString))
      def readLiteral(): String = { // content(i) == '('
        val sb = new StringBuilder
        var depth = 1; i += 1
        while (i < n && depth > 0) {
          val c = content.charAt(i)
          if (c == '\\' && i + 1 < n) {
            val e = content.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case d if d >= '0' && d <= '7' =>
                var j = i + 1; var v = 0
                while (j < n && j < i + 4 && content.charAt(j) >= '0' && content.charAt(j) <= '7') {
                  v = v * 8 + (content.charAt(j) - '0'); j += 1
                }
                sb.append(v.toChar); i = j
              case _ => i += 1 // line-continuation and unknown escapes drop
            }
          } else {
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            if (depth > 0) sb.append(c)
            i += 1
          }
        }
        sb.toString
      }
      def readHex(): String = { // content(i) == '<'
        val close = content.indexOf('>', i)
        if (close < 0) { i = n; return "" }
        val hex = content.substring(i + 1, close).replaceAll("\\s", "")
        i = close + 1
        def bytePerChar(): String = {
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          val sb = new StringBuilder
          var k = 0
          while (k + 2 <= padded.length) {
            try sb.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar)
            catch { case _: NumberFormatException => }
            k += 2
          }
          decodeText(sb.toString)
        }
        if (curFont != null) {
          // per-text-object resolution: this string decodes by the
          // font its own Tf selected, not by file-global heuristics
          if (curFont.composite)
            if (curFont.cmap.nonEmpty) decode2byte(hex, curFont.cmap) else ""
          else mapSimple(bytePerChar(), curFont.cmap)
        } else if (cmap.nonEmpty) {
          // 2-byte ToUnicode codes; unmapped codes drop (degrade)
          val padded = if (hex.length % 4 == 0) hex else hex + "0" * (4 - hex.length % 4)
          val sb = new StringBuilder
          var mapped = 0
          var k = 0
          while (k + 4 <= padded.length) {
            try cmap.get(Integer.parseInt(padded.substring(k, k + 4), 16))
              .foreach { v => sb.append(v); mapped += 1 }
            catch { case _: NumberFormatException => }
            k += 4
          }
          // the cmap and `composite` flag are file-global, so a PDF
          // mixing a simple 1-byte font (hex strings = char codes)
          // with any Type0 font would route the simple font's strings
          // through the 2-byte map and lose them; when the 2-byte
          // read maps NOTHING for a whole non-empty string, assume
          // it belongs to the simple-font world and fall back to
          // byte-per-char — but only keep the fallback when it reads
          // as text (mostly printable), so genuine CIDs absent from a
          // partial ToUnicode still degrade to empty, not garbage.
          // A per-text-object Tf/font-resource resolver is the full
          // fix; this closes the common mixed-font case
          if (mapped == 0 && hex.nonEmpty) {
            val alt = bytePerChar()
            val printable = alt.count(ch => ch >= ' ' && ch < 0x7F)
            if (alt.nonEmpty && printable * 10 >= alt.length * 9) alt else ""
          } else sb.toString
        } else if (composite) "" // CIDs with no map: empty, not garbage
        else bytePerChar()
      }
      // literal string routed by the current font: under a 2-byte
      // font the chars pair into CID codes through its map; under a
      // resolved 1-byte font the (UTF-16-aware) text maps through its
      // own ToUnicode; no font → historical behavior
      def routeLiteral(raw: String): String =
        if (curFont != null && curFont.composite) {
          if (curFont.cmap.isEmpty) ""
          else {
            val sb = new StringBuilder
            var k = 0
            while (k + 1 < raw.length) {
              curFont.cmap.get(((raw.charAt(k) & 0xFF) << 8) | (raw.charAt(k + 1) & 0xFF))
                .foreach(sb.append)
              k += 2
            }
            sb.toString
          }
        } else if (curFont != null) mapSimple(decodeText(raw), curFont.cmap)
        else decodeText(raw)
      while (i < n) {
        val c = content.charAt(i)
        if (c == '(') lastString = routeLiteral(readLiteral())
        else if (c == '<' && i + 1 < n && content.charAt(i + 1) != '<') lastString = readHex()
        else if (c == '<') i += 2 // dict open "<<"
        else if (c == '/') {
          // name token (Tf's font operand, most commonly)
          val start = i + 1
          i += 1
          while (i < n && !content.charAt(i).isWhitespace &&
            "()<>[]/".indexOf(content.charAt(i)) < 0) i += 1
          lastName = content.substring(start, i)
        } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
          // read an operator token
          val start = i
          i += 1
          while (i < n && !content.charAt(i).isWhitespace &&
            content.charAt(i) != '(' && content.charAt(i) != '<' &&
            content.charAt(i) != '[' && content.charAt(i) != ']' &&
            content.charAt(i) != ')') i += 1
          content.substring(start, i) match {
            case "Tj" | "TJ" | "'" | "\"" =>
              if (lastString != null) { out.append(lastString); lastString = null }
            case "Tf" =>
              // a Tf whose name operand was already consumed by an
              // earlier operator (spec-violating `/Tag BDC 12 Tf`)
              // keeps the CURRENT font — never a stale foreign name
              if (lastName != null) curFont = fonts.getOrElse(lastName, null)
            case "Td" | "TD" | "T*" => out.append('\n')
            case "ET" => out.append('\n')
            case _ =>
          }
          // every operator CONSUMES its operands: clear the pending
          // name so Tf only ever sees the name of ITS OWN operand pair
          // (`/F1 12 Tf`) — without this, a name-bearing operator
          // sequence between text objects (marked content `/P <<…>> BDC`,
          // XObject `/Im1 Do`) left its name as the "most recent" one
          // and a spec-violating Tf with no name operand silently
          // decoded with the wrong font
          lastName = null
        } else if (c == '[') {
          // TJ array: collect every string element in order
          i += 1
          val arr = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val ac = content.charAt(i)
            if (ac == '(') arr.append(routeLiteral(readLiteral()))
            else if (ac == '<' && i + 1 < n && content.charAt(i + 1) != '<') arr.append(readHex())
            else if (ac == ']') { closed = true; i += 1 }
            else i += 1
          }
          lastString = arr.toString
        } else i += 1
      }
      // collapse intra-line runs, drop blank lines
      out.toString.split('\n').map(_.trim).filter(_.nonEmpty).mkString("\n")
    }
  }

  /** Default parser chain, first-accept-wins (the reference's
    * extension dispatch). */
  val defaultParsers: Seq[Parser] =
    Seq(TextParser, HtmlParser, DelimitedParser, XlsxParser, XlsParser,
      DocxParser, PdfParser)

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
