package graft

import org.apache.spark.sql.functions._

import graft.ingest.{DocumentParser, RemoteOcrParser}

/** The OCR seam driven end-to-end against an in-process HTTP server
  * implementing the Tika-server route (`PUT /tika` → text/plain): the
  * parser chain claims image files, bytes flow through the protocol
  * from inside a Spark scan stage, unparseable input quarantines, a
  * broken endpoint fails loudly. */
class RemoteOcrParserSpec extends SparkSpec {

  private class FakeTika(mode: String) {
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 16)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/tika", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val bytes = ex.getRequestBody.readAllBytes()
        mode match {
          case "ok" =>
            // deterministic "OCR": text derived from the bytes
            val out = s"scanned text of ${bytes.length} bytes md5 " +
              java.security.MessageDigest.getInstance("MD5").digest(bytes)
                .map("%02x".format(_)).mkString.take(8)
            val b = out.getBytes("UTF-8")
            ex.getResponseHeaders.set("Content-Type", "text/plain")
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case "unparseable" =>
            ex.sendResponseHeaders(422, -1)
          case _ =>
            ex.sendResponseHeaders(500, -1)
        }
      } finally ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("image files OCR through the Tika protocol from a directory scan") {
    val srv = new FakeTika("ok")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_ocr").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "scan_1.png"), Array[Byte](1, 2, 3, 4))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "notes.md"), "# Plain notes".getBytes("UTF-8"))
      val parsers = DocumentParser.defaultParsers :+
        RemoteOcrParser(s"http://127.0.0.1:${srv.port}")
      val out = DocumentParser
        .scanDirectory(spark, dir, "org_ocr", parsers)
        .orderBy(col("filename")).collect()
      assert(out.length == 2)
      assert(out(1).getString(0) == "scan_1.png")
      assert(out(1).getString(1).startsWith("scanned text of 4 bytes"))
      assert(out(0).getString(1) == "# Plain notes")
      // determinism across calls (stable stub => stable text)
      val again = DocumentParser.parseFile("scan_1.png",
        Array[Byte](1, 2, 3, 4), parsers).get.text
      assert(again == out(1).getString(1))
    } finally srv.stop()
  }

  test("422 quarantines to empty; a 5xx endpoint fails loudly") {
    val bad = new FakeTika("unparseable")
    try {
      val p = RemoteOcrParser(s"http://127.0.0.1:${bad.port}")
      assert(p.parse(Array[Byte](9, 9)).text == "")
    } finally bad.stop()
    val broken = new FakeTika("boom")
    try {
      val p = RemoteOcrParser(s"http://127.0.0.1:${broken.port}")
      intercept[IllegalStateException] { p.parse(Array[Byte](9, 9)) }
    } finally broken.stop()
  }

  test("the default chain does NOT claim images (OCR is opt-in config)") {
    assert(DocumentParser.parseFile("scan.png", Array[Byte](1)).isEmpty)
    assert(RemoteOcrParser("http://x").accepts("page.jpeg"))
    assert(!RemoteOcrParser("http://x").accepts("page.pdf"))
  }
}
