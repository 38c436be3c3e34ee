package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.ingest.DocumentParser.{Parsed, Parser}

/** Scanned-document / image text extraction behind the S1 parser seam,
  * speaking the **Apache Tika server protocol** — the de-facto REST
  * standard for content extraction (`PUT /tika`, body = raw file
  * bytes, `Accept: text/plain` → extracted text; Tika delegates images
  * to Tesseract OCR server-side). This is the reference's
  * `hi_res`/OCR strategy (`ingestion/document_processor.py:341-355`,
  * the png/jpg entries of its extension list) re-expressed the same
  * way the engine treats embedding models: the heavy model runs
  * out-of-process behind a public wire protocol, the engine ships
  * only the protocol client, and a deployment points it at
  * `tika-server` (or anything speaking the same route).
  *
  * Failure semantics (deliberately different from the byte-format
  * parsers): transport errors and 5xx THROW — an unreachable OCR
  * server is an ops failure that must fail the task loudly, not
  * silently ingest empty documents; 422 (Tika's unparseable-input
  * status) degrades to empty text — that one IS bad input, and the
  * quarantine stance applies.
  *
  * Determinism caveat: OCR output is as deterministic as the backing
  * server; the engine's own gates keep byte-format parsers. The spec
  * drives this client end-to-end against an in-process HTTP stub
  * implementing the same route. */
final case class RemoteOcrParser(baseUrl: String,
                                 timeoutSeconds: Int = 120) extends Parser {

  private val exts = Seq(".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")

  def accepts(filename: String): Boolean = exts.exists(filename.endsWith)

  def parse(bytes: Array[Byte]): Parsed = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/tika"))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", "application/octet-stream")
      .header("Accept", "text/plain")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    val resp = RemoteOcrParser.client.send(req,
      HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => Parsed(resp.body().trim, "ocr")
      case 422 => Parsed("", "ocr") // unparseable input: quarantine
      case s => throw new IllegalStateException(
        s"tika endpoint returned HTTP $s: ${resp.body().take(200)}")
    }
  }
}

object RemoteOcrParser {
  // one shared client per JVM (executors reuse connections across
  // batched parse calls — the mapPartitions scan stage never pays a
  // client construction per file)
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
}
