package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.serve.QueryService

/** Readers racing mutations over the segmented store: searches and
  * document lists run continuously from reader threads while ingest
  * batches append segments (each a concurrent fan-out of sidecar +
  * derived writes since r7) and a delete forces a full-snapshot flip.
  * Pins the store's consistency contract under the new write
  * concurrency: no reader ever throws or sees a 5xx, every response is
  * well-formed, and the store ends exactly where serial execution
  * would (same doc count, every dense mode still in parity). */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  implicit private val formats: Formats = DefaultFormats

  test("searches and lists stay green while ingests append and a delete compacts") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_concurrency").toString
    val svc = new QueryService(spark, root)

    // seed so readers have something to hit from the start
    svc.ingestBatch(Seq(
      ("seed_1.md", "# Hybrid Retrieval\n\nThe hybrid retrieval engine scores parquet snapshots with BM25 and dense vectors. Results fuse by reciprocal rank and return the top documents for each tenant.", "org_c"),
      ("seed_2.md", "# Streaming Ingest\n\nStreaming micro-batches append delta segments to the store. Each batch writes its own sidecar indexes and rolls the derived statistics forward exactly.", "org_c"))
      .toDF("filename", "text", "organization_id"))

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(3)
    val started = new CountDownLatch(3)

    def readerLoop(req: String): Runnable = () => {
      started.countDown()
      while (!stop.get()) {
        try {
          val r = parse(svc.handle(req))
          (r \ "status") match {
            case JInt(s) if s >= 500 => failures.add(s"5xx on $req: $r")
            case _ => ()
          }
          reads.incrementAndGet()
        } catch {
          case e: Throwable => failures.add(s"reader threw: ${e.getMessage}")
        }
      }
    }
    pool.submit(readerLoop(
      """{"op":"search","organization_id":"org_c","query":"retrieval segments","limit":5}"""))
    pool.submit(readerLoop(
      """{"op":"search","organization_id":"org_c","query":"snapshots","limit":3,"dense_mode":"hnsw"}"""))
    pool.submit(readerLoop(
      """{"op":"documents","organization_id":"org_c","limit":10}"""))
    started.await()

    // writer: 4 delta appends + one delete (forces a full-snapshot
    // flip + grace retirement of superseded dirs) under live readers
    for (i <- 1 to 4)
      svc.ingestBatch(Seq((s"live_$i.md",
        s"# Batch $i\n\nConcurrent ingest batch number $i arrives while readers run. Its distinct body text describes stage $i of the live workload and must appear in subsequent searches.",
        "org_c")).toDF("filename", "text", "organization_id"))
    val ids = (parse(svc.handle(
        """{"op":"documents","organization_id":"org_c","limit":100}"""))
      ).extract[List[JValue]].map(d => (d \ "id").extract[String])
    val del = svc.handle(
      s"""{"op":"delete","organization_id":"org_c","document_id":"${ids.head}"}""")
    assert((parse(del) \ "status").extract[String] == "deleted")

    stop.set(true)
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(failures.isEmpty, failures.toArray.take(3).mkString(" | "))
    assert(reads.get() > 0)

    // end state == serial expectation: 2 seed + 4 live - 1 deleted
    val n = (parse(svc.handle("""{"op":"stats"}""")) \ "database" \ "documents")
      .extract[Long]
    assert(n == 5L, s"expected 5 docs, got $n")
    // every dense mode still agrees after the racing mutations
    for (mode <- Seq("exact", "ann", "quantized", "ivfpq", "hnsw")) {
      val r = parse(svc.handle(
        s"""{"op":"search","organization_id":"org_c","query":"concurrent ingest batch","dense_mode":"$mode","limit":3}"""))
      assert((r \ "total_results").extract[Int] > 0, mode)
    }
  }
}
