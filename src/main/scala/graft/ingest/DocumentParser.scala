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

  /** Default parser chain, first-accept-wins (the reference's
    * extension dispatch). */
  val defaultParsers: Seq[Parser] = Seq(TextParser, HtmlParser, DelimitedParser)

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
