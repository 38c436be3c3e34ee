package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, FeatureHashEmbedder, RerankScorer}
import graft.ingest.Pipeline
import graft.model.TenantContext
import graft.retrieval.{HybridSearch, Rerank}

/** The pluggable model seams (I9/V12): a second toy implementation
  * swaps in through Pipeline.ingest / HybridSearch.Config / Rerank
  * without any other code change, and the default path is unchanged
  * (the oracle gates pin it; here we pin trait-default equivalence). */
class ModelSeamSpec extends SparkSpec {
  import spark.implicits._

  /** Toy embedder: one-hot on token count mod dim — valid (unit norm),
    * deliberately unlike feature hashing. */
  case class TokenCountEmbedder(dim: Int = 8) extends Embedder {
    override def embed(tokens: Column): Column = {
      val idx = size(tokens) % dim
      transform(sequence(lit(0), lit(dim - 1)),
        i => when(i === idx, 1.0).otherwise(0.0))
    }
    override def embedQuery(tokens: Seq[String]): Array[Double] =
      Array.tabulate(dim)(i => if (i == tokens.size % dim) 1.0 else 0.0)
  }

  /** Toy scorer: shorter text wins — ignores the query entirely. */
  object BrevityScorer extends RerankScorer {
    override def score(text: Column, queryTokens: Seq[String]): Column =
      lit(1.0) / (length(text).cast("double") + 1.0)
  }

  private val docs = Seq(
    (1L, Seq.fill(12)("spark join filter merge window table scan").mkString(". "), "org1"),
    (2L, Seq.fill(12)("hash aggregate exchange broadcast partition pruning").mkString(". "), "org1"),
    (3L, Seq.fill(12)("sort shuffle spill codegen stage task").mkString(". "), "org1"))
    .toDF("doc_id", "text", "org")

  test("a second embedder swaps in through ingest and search config") {
    val bundle = Pipeline.ingest(docs, embedder = TokenCountEmbedder(),
      orgCol = Some("org"))
    // embeddings are one-hot at (token count mod 8)
    val doc1 = bundle.chunks.filter(col("id") === "1_doc")
      .select(col("embedding")).head().getSeq[Double](0)
    assert(doc1.count(_ == 1.0) == 1 && doc1.sum == 1.0)

    val out = HybridSearch.search(
      bundle.chunks, "spark join filter", TenantContext("org1"),
      cfg = HybridSearch.Config(limit = 3, embedder = TokenCountEmbedder(),
        levelFilter = None),
      index = Some(bundle.bm25Index))
    assert(out.count() > 0)
    assert(out.columns.contains("dense_score"))
  }

  test("default embedder path is FeatureHashEmbedder — bit-identical") {
    val viaDefault = Pipeline.ingest(docs, orgCol = Some("org"))
      .chunks.select(col("id"), col("embedding"))
    val viaExplicit = Pipeline.ingest(docs,
        embedder = FeatureHashEmbedder(64), orgCol = Some("org"))
      .chunks.select(col("id"), col("embedding"))
    assert(viaDefault.exceptAll(viaExplicit).isEmpty
      && viaExplicit.exceptAll(viaDefault).isEmpty)
  }

  test("batched RPC embedder drives ingest + search through real sockets") {
    // deterministic fake inference server: computes the feature-hash
    // embedding via the JVM twin, so the RPC path must be BIT-IDENTICAL
    // to the default FeatureHashEmbedder (Double.toString round-trips
    // exactly) — proving serialization, batching, and the unit-norm
    // contract under distribution without any model dependency
    val server = new FakeEmbedServer(dim = 64)
    try {
      val rpc = graft.functions.ExternalEmbedder(
        "127.0.0.1", server.port, dim = 64, batchSize = 4)
      val viaRpc = Pipeline.ingest(docs, embedder = rpc, orgCol = Some("org"))
      val viaDefault = Pipeline.ingest(docs, orgCol = Some("org"))
      val a = viaRpc.chunks.select(col("id"), col("embedding"))
      val b = viaDefault.chunks.select(col("id"), col("embedding"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

      // search end-to-end with the RPC embedder (query embeds through
      // the same server, driver-side)
      val out = HybridSearch.search(
        viaRpc.chunks, "spark join filter", TenantContext("org1"),
        cfg = HybridSearch.Config(limit = 3, embedder = rpc,
          levelFilter = None),
        index = Some(viaRpc.bm25Index))
      assert(out.count() > 0)

      // batching held: every request carried <= batchSize docs, and
      // the RPC count is far below the row count
      val sizes = server.batchSizes
      assert(sizes.nonEmpty && sizes.max <= 4, sizes.mkString(","))
    } finally server.stop()
  }

  test("a non-unit-norm server fails the task loudly at the seam") {
    val server = new FakeEmbedServer(dim = 64, breakNorm = true)
    try {
      val rpc = graft.functions.ExternalEmbedder(
        "127.0.0.1", server.port, dim = 64, batchSize = 4)
      val ex = intercept[org.apache.spark.SparkException] {
        Pipeline.ingest(docs, embedder = rpc, orgCol = Some("org"))
          .chunks.select(col("embedding")).collect()
      }
      assert(String.valueOf(ex.getMessage).contains("unit-norm") ||
        Option(ex.getCause).exists(c =>
          String.valueOf(c.getMessage).contains("unit-norm")))
    } finally server.stop()
  }

  test("OpenAI-protocol embedder drives ingest + search against a live HTTP endpoint") {
    // in-process server speaking the real /v1/embeddings wire shape
    // (vLLM / TEI / Ollama / hosted APIs): JSON batches in, indexed
    // vectors out — returned UNNORMALIZED and in REVERSE index order,
    // so this pins the client's index reassembly and L2 normalization
    val server = new FakeOpenAiServer(dim = 64, scale = 3.0)
    try {
      val oa = graft.functions.OpenAiEmbedder(
        s"http://127.0.0.1:${server.port}", "fake-bge", dim = 64, batchSize = 4)
      // query path: scaled-then-normalized server vector == the
      // feature-hash direction (elementwise, fp tolerance)
      val q = oa.embedQuery(Seq("spark", "join"))
      val want = graft.functions.EmbedFunctions.embedQuery(Seq("spark", "join"), 64)
      assert(q.length == 64)
      q.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }

      val viaHttp = Pipeline.ingest(docs, embedder = oa, orgCol = Some("org"))
      // every stored vector is unit-norm (the V1 cosine ≡ dot contract
      // survived the non-normalizing server)
      val norms = viaHttp.chunks.filter(col("embedding").isNotNull)
        .select(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x * x).as("n2"))
        .as[Double].collect()
      assert(norms.nonEmpty && norms.forall(n => math.abs(n - 1.0) < 1e-9))

      // end-to-end search: same top hit as the default embedder (the
      // server computes the same directions)
      val out = HybridSearch.search(
        viaHttp.chunks, "spark join filter", TenantContext("org1"),
        cfg = HybridSearch.Config(limit = 3, embedder = oa, levelFilter = None),
        index = Some(viaHttp.bm25Index))
      val viaDefault = Pipeline.ingest(docs, orgCol = Some("org"))
      val outDefault = HybridSearch.search(
        viaDefault.chunks, "spark join filter", TenantContext("org1"),
        cfg = HybridSearch.Config(limit = 3, levelFilter = None),
        index = Some(viaDefault.bm25Index))
      assert(out.select("id").as[String].collect().head ==
        outDefault.select("id").as[String].collect().head)
      // batching held over HTTP too
      val sizes = server.batchSizes
      assert(sizes.nonEmpty && sizes.max <= 4, sizes.mkString(","))
    } finally server.stop()
  }

  test("OpenAI-protocol embedder fails loudly on a wrong-dim endpoint") {
    val server = new FakeOpenAiServer(dim = 32, scale = 1.0)
    try {
      val oa = graft.functions.OpenAiEmbedder(
        s"http://127.0.0.1:${server.port}", "fake-bge", dim = 64)
      val ex = intercept[Exception] {
        Pipeline.ingest(docs, embedder = oa, orgCol = Some("org"))
          .chunks.select(col("embedding")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("dim 32")))
    } finally server.stop()
  }

  test("remote cross-encoder reranks through the TEI /rerank protocol") {
    // the stub's "model": inverse length-distance to the query —
    // deliberately unlike lexical overlap, so the remote order is
    // observably the SERVER's ranking, reassembled by index from a
    // reverse-ordered response
    val server = new FakeRerankServer()
    try {
      val ce = graft.functions.RemoteCrossEncoder(
        s"http://127.0.0.1:${server.port}", batchSize = 2)
      val cands = Seq(
        (1L, "spark join filter merge window table scan extra words here"),
        (2L, "spark join"),
        (3L, "unrelated text entirely")).toDF("id", "text")
        .coalesce(1) // one partition → observable grouped(2) batching
      val out = Rerank.rerankRemote(cands, "spark join filter", 3, ce)
        .select(col("id"), col("rerank_score")).collect()
      // closest-length text to the 17-char query wins under the stub
      assert(out.head.getLong(0) == 3L, out.mkString(","))
      assert(out.map(_.getDouble(1)).toSeq == out.map(_.getDouble(1)).sorted.reverse.toSeq)
      // batching: 3 texts at batchSize=2 → 2 requests
      assert(server.batchSizes.sorted == Seq(1, 2), server.batchSizes)
    } finally server.stop()
  }

  test("a second rerank scorer swaps in and changes the order") {
    val cands = Seq(
      (1L, "spark join filter merge window table scan extra words here"),
      (2L, "spark join"),
      (3L, "unrelated text entirely")).toDF("id", "text")
    val lex = Rerank.rerank(cands, "spark join filter", 3)
      .select(col("id")).as[Long].collect().toSeq
    val brief = Rerank.rerank(cands, "spark join filter", 3, BrevityScorer)
      .select(col("id")).as[Long].collect().toSeq
    assert(lex.head == 1L) // full lexical overlap wins
    assert(brief.head == 2L) // shortest text wins
  }

  test("multi-vector ColPali-protocol embedder populates the packed page store end-to-end") {
    // in-process server speaking the multi-vector /v1/embeddings wire
    // shape: per-input patch MATRICES, returned unnormalized (×2) and
    // in reverse index order — pins index reassembly + row-wise L2
    val server = new FakeColPaliServer(dim = 16, scale = 2.0)
    try {
      val cp = graft.functions.ColPaliEmbedder(
        s"http://127.0.0.1:${server.port}", "fake-colpali", dim = 16,
        batchSize = 2)

      // query side: one unit patch per token, equal to the engine's
      // deterministic stand-in (the server computes the same directions)
      val qm = cp.embedQuery("spark join")
      assert(qm.length == 2 && qm.forall(_.length == 16))
      qm(0).zip(graft.functions.EmbedFunctions.embedQuery(Seq("spark"), 16))
        .foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }

      // page side: 2 docs × 2 pages, embedded over HTTP, persisted in
      // the q27/q50 packed-f32 layout, reloaded, and scored
      val pageText = Seq(
        (0L, 0, "spark join broadcast"), (0L, 1, "hash exchange shuffle"),
        (1L, 0, "spark filter window"), (1L, 1, "sort spill codegen"))
        .toDF("document_id", "page_number", "page_text")
      val viaHttp = cp.embedFrame(pageText, "page_text")
        .select(col("document_id"), col("page_number"), col("patches"))
      val root = graft.operators.TmpDirs.create("graft_colpali_seam")
      graft.sources.TableStore.savePages(viaHttp, root, dim = 16)
      val loaded = graft.sources.TableStore.loadPages(spark, root)
      assert(loaded.columns.contains("packed"))

      // chunks on pages 0-1 propagate directly; page 2 exercises the
      // ×0.8 doc fallback
      val chunks = Seq(
        ("c00", 0L, 0), ("c01", 0L, 1), ("c0f", 0L, 2),
        ("c10", 1L, 0), ("c11", 1L, 1))
        .toDF("id", "document_id", "page_number")
      val got = HybridSearch.colpaliPropagate(
        chunks, loaded, Seq("spark", "join"), HybridSearch.Config(), fetch = 10)
        .select(col("id"), col("score")).as[(String, Double)].collect().toSeq

      // expected: the same patches built locally with the stand-in
      // kernel (the server's model IS the stand-in ×2, normalized back)
      val localPatches = pageText.as[(Long, Int, String)].collect().toSeq
        .map { case (d, p, t) =>
          (d, p, t.split(" ").toSeq.map(tok =>
            graft.functions.EmbedFunctions.embedQuery(Seq(tok), 16).toSeq))
        }.toDF("document_id", "page_number", "patches")
      val want = HybridSearch.colpaliPropagate(
        chunks, localPatches, Seq("spark", "join"), HybridSearch.Config(), fetch = 10)
        .select(col("id"), col("score")).as[(String, Double)].collect().toSeq
      assert(got == want, s"\ngot  $got\nwant $want")
      // the fallback chunk is present and scored at 0.8 × its doc best
      assert(got.exists(_._1 == "c0f"))
      // batching held over HTTP
      val sizes = server.batchSizes
      assert(sizes.nonEmpty && sizes.max <= 2, sizes.mkString(","))
    } finally server.stop()
  }

  test("multi-vector embedder fails loudly on a wrong-dim endpoint") {
    val server = new FakeColPaliServer(dim = 8, scale = 1.0)
    try {
      val cp = graft.functions.ColPaliEmbedder(
        s"http://127.0.0.1:${server.port}", "fake-colpali", dim = 16)
      val ex = intercept[Exception] {
        cp.embedFrame(Seq((1L, "spark join")).toDF("id", "t"), "t")
          .select(col("patches")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("patch dim 8")))
    } finally server.stop()
  }
}

/** Deterministic fake inference endpoint speaking ExternalEmbedder's
  * line protocol: TAB-separated docs in, TAB-separated space-joined
  * vectors out, one batch per connection, concurrent connections
  * served (executors connect in parallel under local[32]). The
  * "model" is the feature-hash JVM twin, so expected outputs are
  * exactly the default embedder's. `breakNorm` de-normalizes every
  * vector to exercise the client's contract check. */
class FakeEmbedServer(dim: Int, breakNorm: Boolean = false) {
  private val ss = new java.net.ServerSocket(0, 64,
    java.net.InetAddress.getByName("127.0.0.1"))
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  @volatile private var closed = false

  def port: Int = ss.getLocalPort
  def batchSizes: Seq[Int] = {
    val b = Seq.newBuilder[Int]
    sizes.forEach(s => b += s)
    b.result()
  }

  private val acceptor = new Thread(() => {
    try while (!closed) {
      val s = ss.accept()
      new Thread(() => handle(s)).start()
    } catch { case _: java.net.SocketException => () } // closed
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(s: java.net.Socket): Unit =
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream))
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      val line = in.readLine()
      if (line != null) {
        val docs = line.split("\t", -1).toSeq
        sizes.add(docs.size)
        val resp = docs.map { d =>
          val toks = if (d.isEmpty) Seq.empty[String] else d.split(" ").toSeq
          val v = graft.functions.EmbedFunctions.embedQuery(toks, dim)
          val w = if (breakNorm) v.map(_ * 2.0 + 0.5) else v
          w.mkString(" ")
        }.mkString("\t")
        out.println(resp)
      }
    } finally s.close()

  def stop(): Unit = { closed = true; ss.close() }
}

/** In-process HTTP endpoint speaking the OpenAI `/v1/embeddings`
  * protocol (the vLLM / TEI / Ollama serving shape): JSON request
  * `{model, input: [...]}` → `{data: [{index, embedding}]}`. The
  * "model" is the feature-hash JVM twin times `scale` (unnormalized —
  * the client must L2-normalize), and `data` comes back in REVERSE
  * index order (the spec permits any order — the client must
  * reassemble by index). */
class FakeOpenAiServer(dim: Int, scale: Double) {
  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 64)
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

  def port: Int = server.getAddress.getPort
  def batchSizes: Seq[Int] = {
    val b = Seq.newBuilder[Int]
    sizes.forEach(s => b += s)
    b.result()
  }

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.createContext("/v1/embeddings", (ex: com.sun.net.httpserver.HttpExchange) => {
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods.{compact, parse, render}
      implicit val formats: Formats = DefaultFormats
      val req = parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      val inputs = (req \ "input") match {
        case JArray(xs) => xs.map(_.extract[String])
        case JString(s) => List(s)
        case _ => Nil
      }
      sizes.add(inputs.size)
      val items = inputs.zipWithIndex.map { case (text, i) =>
        val toks = if (text.isEmpty) Seq.empty[String] else text.split(" ").toSeq
        val v = graft.functions.EmbedFunctions.embedQuery(toks, dim).map(_ * scale)
        JObject("index" -> JInt(i),
          "embedding" -> JArray(v.map(JDouble(_)).toList))
      }.reverse // spec-legal reordering the client must undo
      val resp = compact(render(JObject(
        "object" -> JString("list"), "data" -> JArray(items))))
        .getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
    } finally ex.close()
  })
  server.start()

  def stop(): Unit = server.stop(0)
}

/** In-process endpoint speaking the MULTI-VECTOR `/v1/embeddings`
  * shape (the ColPali/ColBERT serving convention): each data item's
  * `embedding` is a patch MATRIX — one row per whitespace token of the
  * input, the feature-hash JVM twin times `scale` (unnormalized — the
  * client must row-normalize), `data` in REVERSE index order (the
  * client must reassemble by index). */
class FakeColPaliServer(dim: Int, scale: Double) {
  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 64)
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

  def port: Int = server.getAddress.getPort
  def batchSizes: Seq[Int] = {
    val b = Seq.newBuilder[Int]
    sizes.forEach(s => b += s)
    b.result()
  }

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.createContext("/v1/embeddings", (ex: com.sun.net.httpserver.HttpExchange) => {
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods.{compact, parse, render}
      implicit val formats: Formats = DefaultFormats
      val req = parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      val inputs = (req \ "input") match {
        case JArray(xs) => xs.map(_.extract[String])
        case JString(s) => List(s)
        case _ => Nil
      }
      sizes.add(inputs.size)
      val items = inputs.zipWithIndex.map { case (text, i) =>
        val toks = if (text.isEmpty) Seq.empty[String] else text.split(" ").toSeq
        val m = toks.map(t =>
          graft.functions.EmbedFunctions.embedQuery(Seq(t), dim).map(_ * scale))
        JObject("index" -> JInt(i),
          "embedding" -> JArray(m.map(v =>
            JArray(v.map(JDouble(_)).toList)).toList))
      }.reverse // spec-legal reordering the client must undo
      val resp = compact(render(JObject(
        "object" -> JString("list"), "data" -> JArray(items))))
        .getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
    } finally ex.close()
  })
  server.start()

  def stop(): Unit = server.stop(0)
}

/** In-process endpoint speaking the TEI `/rerank` protocol: JSON
  * {query, texts} → [{index, score}], response REVERSED (index
  * reassembly required). Score = 1/(1+|len(text)-len(query)|) —
  * a deterministic stand-in deliberately unlike lexical overlap. */
class FakeRerankServer {
  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 16)
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

  def port: Int = server.getAddress.getPort
  def batchSizes: Seq[Int] = {
    val b = Seq.newBuilder[Int]
    sizes.forEach(s => b += s)
    b.result()
  }

  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.createContext("/rerank", (ex: com.sun.net.httpserver.HttpExchange) => {
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods.{compact, parse, render}
      implicit val formats: Formats = DefaultFormats
      val req = parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      val query = (req \ "query").extract[String]
      val texts = (req \ "texts") match {
        case JArray(xs) => xs.map(_.extract[String])
        case _ => Nil
      }
      sizes.add(texts.size)
      val items = texts.zipWithIndex.map { case (t, i) =>
        JObject("index" -> JInt(i),
          "score" -> JDouble(1.0 / (1 + math.abs(t.length - query.length))))
      }.reverse
      val resp = compact(render(JArray(items))).getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
    } finally ex.close()
  })
  server.start()

  def stop(): Unit = server.stop(0)
}
