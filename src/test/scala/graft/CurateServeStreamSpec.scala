package graft

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.operators.TmpDirs
import graft.serve.QueryService
import graft.streaming.{CurationStream, EventStream}

/** Curate→serve composed stream: per micro-batch, arriving documents
  * are curated (exact + MinHash near-dedup against everything curated
  * so far) and ONLY the survivors are indexed into the serving store —
  * a planted near-dup is dropped by the stream while its original
  * stays searchable, and a survivor becomes retrievable via
  * `QueryService.search` at the next batch boundary. */
class CurateServeStreamSpec extends SparkSpec {

  implicit private val formats: Formats = DefaultFormats

  private val contractText =
    "The service agreement covers payment terms and renewal options for the client. " +
      "All invoices are due within thirty days of the billing date as agreed. " +
      "Either party may terminate the contract with ninety days written notice."
  private val breadText =
    "Sourdough bread needs flour, water, salt, and long patience before the bake. " +
      "Let the dough rise for two hours in a warm place until it doubles. " +
      "Bake at high heat until the crust turns deep golden brown."
  // near-dup of contractText: identical but for a short appended tail
  // (well above the 0.8 Jaccard threshold on whitespace tokens)
  private val contractNearDup = contractText + " Appendix note seven."
  private val auditText =
    "The annual audit reviews ledger entries and reconciles every account balance. " +
      "Findings are reported to the board with remediation deadlines attached. " +
      "External auditors sign the final statement after the review closes."

  private def jdoc(filename: String, text: String, org: String): String =
    s"""{"filename":"$filename","text":"$text","organization_id":"$org"}"""

  test("near-dups are dropped before indexing; survivors become searchable next batch") {
    val tmp = TmpDirs.create("graft_curate_serve")
    val docsDir = s"$tmp/docs"
    Files.createDirectories(Paths.get(docsDir))
    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(docsDir, name), lines.mkString("\n").getBytes("UTF-8"))
    val svc = new QueryService(spark, s"$tmp/store")
    def call(json: String): JValue = parse(svc.handle(json))
    def drain(): Unit = CurationStream.curateToServeStream(svc,
      EventStream.readDocs(spark, docsDir), s"$tmp/state", s"$tmp/ckpt")
      .start().awaitTermination()

    // batch 1: two originals + a same-batch near-dup of the contract
    drop("b1.jsonl", Seq(
      jdoc("contract.md", contractText, "org_a"),
      jdoc("bread.md", breadText, "org_a"),
      jdoc("contract_copy.md", contractNearDup, "org_a")))
    drain()

    // the near-dup never reached the store: 2 documents, not 3
    assert((call("""{"op":"stats"}""") \ "database" \ "documents")
      .extract[Long] == 2L)
    // the surviving original is retrievable through the service
    val s1 = call("""{"op":"search","organization_id":"org_a","query":"payment terms invoice","limit":5}""")
    assert((s1 \ "results").extract[List[JValue]]
      .exists(r => (r \ "text").extract[String].contains("payment terms")))
    // curation state recorded exactly the survivors
    assert(spark.read.parquet(s"$tmp/state/docs").count() == 2L)

    // batch 2: a cross-batch near-dup of the contract (dropped against
    // the cumulative state) + a fresh doc (indexed and searchable)
    drop("b2.jsonl", Seq(
      jdoc("contract_again.md", contractText + " Appendix note eight.", "org_a"),
      jdoc("audit.md", auditText, "org_a")))
    drain()

    assert((call("""{"op":"stats"}""") \ "database" \ "documents")
      .extract[Long] == 3L)
    val s2 = call("""{"op":"search","organization_id":"org_a","query":"annual audit ledger reconciles","limit":5}""")
    assert((s2 \ "results").extract[List[JValue]]
      .exists(r => (r \ "text").extract[String].contains("audit")))

    // batch 3: byte-identical redelivery under a new filename —
    // exact-dropped by the curation state, store count unchanged
    drop("b3.jsonl", Seq(jdoc("contract_redelivered.md", contractText, "org_a")))
    drain()
    assert((call("""{"op":"stats"}""") \ "database" \ "documents")
      .extract[Long] == 3L)
  }

  test("curation identity is tenant-scoped: another org's identical and near-dup copies survive") {
    val tmp = TmpDirs.create("graft_curate_tenant")
    val docsDir = s"$tmp/docs"
    Files.createDirectories(Paths.get(docsDir))
    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(docsDir, name), lines.mkString("\n").getBytes("UTF-8"))
    val svc = new QueryService(spark, s"$tmp/store")
    def call(json: String): JValue = parse(svc.handle(json))
    def drain(): Unit = CurationStream.curateToServeStream(svc,
      EventStream.readDocs(spark, docsDir), s"$tmp/state", s"$tmp/ckpt")
      .start().awaitTermination()
    def docCount: Long =
      (call("""{"op":"stats"}""") \ "database" \ "documents").extract[Long]
    def found(org: String): Boolean =
      (parse(svc.handle(s"""{"op":"search","organization_id":"$org","query":"payment terms invoice renewal","limit":5}"""))
        \ "results").extract[List[JValue]]
        .exists(r => (r \ "text").extract[String].contains("payment terms"))

    // batch 1: org_a curates the contract
    drop("b1.jsonl", Seq(jdoc("contract.md", contractText, "org_a")))
    drain()
    assert(docCount == 1L)

    // batch 2: org_b streams the BYTE-IDENTICAL text — a global dedup
    // identity would silently drop it against org_a's copy; the scoped
    // identity must let it survive and index into org_b's tenant
    drop("b2.jsonl", Seq(jdoc("contract.md", contractText, "org_b")))
    drain()
    assert(docCount == 2L, "org_b's identical copy must survive curation")
    assert(found("org_b"), "org_b's copy must be searchable in its own tenant")
    assert(found("org_a"), "org_a's copy must remain searchable")

    // batch 3: a near-dup from org_b DROPS (same-org near-dedup still
    // applies, vs org_b's own curated copy); the same near-dup from
    // org_c SURVIVES (no org_c corpus to match)
    drop("b3.jsonl", Seq(
      jdoc("contract_v2.md", contractNearDup, "org_b"),
      jdoc("contract_v2.md", contractNearDup, "org_c")))
    drain()
    assert(docCount == 3L,
      "org_b near-dup drops against its own tenant; org_c's survives")
    assert(found("org_c"))
    // curation state holds exactly the three survivors
    assert(spark.read.parquet(s"$tmp/state/docs").count() == 3L)
  }

  test("curate→serve replays a failed batch without losing survivors") {
    val tmp = TmpDirs.create("graft_curate_replay")
    val docsDir = s"$tmp/docs"
    Files.createDirectories(Paths.get(docsDir))
    Files.write(Paths.get(docsDir, "b1.jsonl"), Seq(
      jdoc("contract.md", contractText, "org_a"),
      jdoc("bread.md", breadText, "org_a")).mkString("\n").getBytes("UTF-8"))

    // inject exactly one serving-store failure: the micro-batch dies
    // AFTER curation computed survivors but BEFORE any state append
    // (the ingest-before-commit ordering under test — with the old
    // state-first ordering the replay exact-drops every survivor
    // against the half-committed batch's own keys and the documents
    // are silently lost)
    class FlakyService(root: String) extends QueryService(spark, root) {
      @volatile var failuresLeft = 1
      override def ingestBatch(docs: org.apache.spark.sql.DataFrame): Long =
        if (failuresLeft > 0) {
          failuresLeft -= 1
          throw new RuntimeException("injected store failure")
        } else super.ingestBatch(docs)
    }
    val svc = new FlakyService(s"$tmp/store")
    def drain(): Unit = CurationStream.curateToServeStream(svc,
      EventStream.readDocs(spark, docsDir), s"$tmp/state", s"$tmp/ckpt")
      .start().awaitTermination()

    // first attempt fails mid-batch
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    // nothing may have been committed to the curation state
    assert(!new java.io.File(s"$tmp/state/keys").exists(),
      "a failed batch must not leave state behind")

    // checkpoint replay: same batch re-derives the same survivors
    // against the untouched state and ingests them
    drain()
    def call(json: String): JValue = parse(svc.handle(json))
    assert((call("""{"op":"stats"}""") \ "database" \ "documents")
      .extract[Long] == 2L, "both survivors must reach the store on replay")
    val s = call("""{"op":"search","organization_id":"org_a","query":"payment terms invoice","limit":5}""")
    assert((s \ "results").extract[List[JValue]]
      .exists(r => (r \ "text").extract[String].contains("payment terms")))
    assert(spark.read.parquet(s"$tmp/state/docs").count() == 2L)

    // a further redelivery of the same file is still a no-op (identity
    // unchanged by the replay machinery)
    Files.write(Paths.get(docsDir, "b2.jsonl"),
      Seq(jdoc("contract_again.md", contractText, "org_a")).mkString("\n").getBytes("UTF-8"))
    drain()
    assert((call("""{"op":"stats"}""") \ "database" \ "documents")
      .extract[Long] == 2L)
  }

  test("per-batch curation leaks no session-cache entries (state appends stay O(batch))") {
    // a cached plan left behind by a batch is re-optimized by Spark's
    // CacheManager on EVERY subsequent state append (recacheByPath):
    // per-batch commit cost then grows ~linearly in batch count
    // (measured +1 s/batch via the jaccardVerify shingle cache before
    // its release was wired). Pin: entry count does not grow across
    // batches. CacheManager is private[sql] → reflection.
    def cacheEntries: Int = {
      val ssm = spark.getClass.getMethod("sharedState").invoke(spark)
      val cm = ssm.getClass.getMethod("cacheManager").invoke(ssm)
      val f = cm.getClass.getDeclaredFields
        .find(_.getName.contains("cachedData")).get
      f.setAccessible(true)
      f.get(cm).asInstanceOf[Seq[Any]].size
    }
    val state = Files.createTempDirectory("graft_leak_state").toString
    import org.apache.spark.sql.functions.{col, concat, lit, md5 => smd5}
    def batch(i: Int) = spark.range(i * 100, i * 100 + 30)
      .select(col("id"),
        concat(lit(s"batch $i doc "), smd5(col("id").cast("string")),
          lit(" unique body with enough words to pass the line rules "
            + "and form shingles across tokens.")).as("text"),
        lit("org_leak").as("scope"))
    val before = cacheEntries
    for (i <- 1 to 3) {
      val out = CurationStream.curateSurvivorsDeferred(batch(i), state)
      out.commit()
      out.release()
    }
    assert(cacheEntries == before,
      s"cache entries grew: $before -> $cacheEntries (per-batch plan leak)")
  }
}
