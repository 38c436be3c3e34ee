package graft

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.operators.TmpDirs
import graft.serve.QueryService
import graft.sources.SegmentedStore

/** Multi-instance serving: the reference serves one database from many
  * API workers; this store's equivalent is several [[QueryService]]
  * instances — threads or PROCESSES — over one root. Two instances in
  * one JVM have fully independent in-memory state (manifest, bundle,
  * grace lists), so they exercise exactly the cross-process seams:
  * the `_store.lock` mutation lease, the pre-mutation rebase from the
  * on-disk CURRENT, the bounded-staleness read refresh, and the
  * rebase-and-retry when a peer's flip retired files a stale view
  * still references. */
class MultiInstanceSpec extends SparkSpec {

  implicit private val formats: Formats = DefaultFormats

  private def docsDf(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("filename", "text", "organization_id")
  }

  private def batch(tag: String, n: Int = 3) = docsDf((1 to n).map { i =>
    (s"${tag}_$i.md",
      s"Document $i of batch $tag carries the marker word $tag " +
        s"plus enough shared retrieval vocabulary to index cleanly.",
      "org_multi")
  })

  private def hits(svc: QueryService, q: String): Int =
    (parse(svc.handle(
      s"""{"op":"search","organization_id":"org_multi","query":"$q","limit":10}"""))
      \ "total_results").extract[Int]

  test("two instances over one root: mutations rebase and compose, reads converge") {
    val root = TmpDirs.create("graft_multi_compose")
    val a = new QueryService(spark, root)
    val b = new QueryService(spark, root)
    // a seeds; b's in-memory view still predates the store
    a.ingestBatch(batch("alphaone"))
    // b's mutation must REBASE from disk before building: pre-lease
    // behavior would flip a manifest built from b's stale None state,
    // silently dropping a's generation
    b.ingestBatch(batch("betatwo"))
    val m = SegmentedStore.readManifest(root).get
    assert(m.segments.nonEmpty,
      s"b must append a delta to a's base, not re-seed: $m")
    // a rebases over b's flip in turn
    a.ingestBatch(batch("gammathree"))
    // a fresh instance sees all three batches
    val c = new QueryService(spark, root)
    Seq("alphaone", "betatwo", "gammathree").foreach { tag =>
      assert(hits(c, tag) > 0, s"fresh instance must see $tag")
    }
    // and the ORIGINAL instances converge via the freshness window
    // (1 s default): a peer's flip becomes visible without any error
    Thread.sleep(1100)
    assert(hits(a, "betatwo") > 0, "a must see b's batch after the window")
    Thread.sleep(1100)
    assert(hits(b, "gammathree") > 0, "b must see a's batch after the window")
  }

  test("a mutation scrubs a torn predecessor's litter from the segment it reuses") {
    val root = TmpDirs.create("graft_multi_litter")
    val a = new QueryService(spark, root)
    a.ingestBatch(batch("seedbatch")) // base gen0, seq 0
    // a killed writer's torn seg1: tables the NEXT delta may not write
    // (a bogus extra table stands in for any of them). If startup GC is
    // skipped (lease timeout), the next mutation reuses seq 1 — its
    // per-table overwrites would clean only ITS tables, leaving these
    // inside a now-referenced segment to serve ghost ids.
    import java.nio.file.{Files, Paths}
    val litter = Paths.get(root, "seg1", "bogus_sidecar")
    Files.createDirectories(litter)
    Files.write(litter.resolve("part-torn.parquet"), Array[Byte](9, 9, 9))
    Files.createDirectories(Paths.get(root, "derived1", "bogus_stats"))
    val b = new QueryService(spark, root) // startup GC reaps it...
    // ...but the writeSegment scrub must hold even WITHOUT that GC:
    // re-plant after construction, then mutate
    Files.createDirectories(litter)
    Files.write(litter.resolve("part-torn.parquet"), Array[Byte](9, 9, 9))
    Files.createDirectories(Paths.get(root, "derived1", "bogus_stats"))
    b.ingestBatch(batch("secondbatch"))
    assert(!Files.exists(litter),
      "the reused segment must contain only what THIS delta wrote")
    assert(!Files.exists(Paths.get(root, "derived1", "bogus_stats")),
      "derived litter scrubs with the segment")
    val m = SegmentedStore.readManifest(root).get
    assert(m.segments == List("seg1") && m.seq == 1)
    Seq("seedbatch", "secondbatch").foreach { tag =>
      assert(hits(b, tag) > 0, s"$tag must be searchable after the scrub")
    }
    // the FULL-snapshot path scrubs too: a torn first seed's litter at
    // gen0 (no CURRENT yet, so startup GC is a no-op — nothing to
    // reference against) must not survive a fresh seed
    val root2 = TmpDirs.create("graft_multi_litter2")
    val litter2 = Paths.get(root2, "gen0", "bogus_sidecar")
    Files.createDirectories(litter2)
    Files.write(litter2.resolve("part-torn.parquet"), Array[Byte](9, 9, 9))
    val c = new QueryService(spark, root2)
    c.ingestBatch(batch("freshseed"))
    assert(!Files.exists(litter2),
      "the full-snapshot generation must contain only what the seed wrote")
    assert(hits(c, "freshseed") > 0)
  }

  test("a stale instance recovers when a peer's flips retire its view's files") {
    val root = TmpDirs.create("graft_multi_stale")
    // freshness disabled: every read plans against the instance's
    // memoized view until an ERROR forces the rebase — pinning the
    // retry path deterministically instead of racing a 1 s window
    val a = new QueryService(spark, root,
      freshnessWindowMs = Long.MaxValue)
    a.ingestBatch(batch("seedbatch"))
    a.ingestBatch(batch("segmentone")) // a's view = base + seg + derived
    assert(hits(a, "segmentone") > 0)
    // a peer flips TWICE: the second flip drops the derived dir (and
    // any folded segment) a's memoized view still references — the
    // per-instance one-flip grace cannot see a's in-flight readers
    val b = new QueryService(spark, root)
    b.ingestBatch(batch("peerone"))
    b.ingestBatch(batch("peertwo"))
    // a's next search hits FAILED_READ/UNABLE_TO_INFER_SCHEMA on the
    // retired files; readOp rebases to CURRENT and retries once — the
    // caller sees a successful, FRESH answer, never the error
    assert(hits(a, "peertwo") > 0,
      "stale instance must rebase-and-retry into the current view")
    assert(hits(a, "seedbatch") > 0, "pre-existing docs still served")
  }

  test("stats and document listing stay consistent across instances") {
    val root = TmpDirs.create("graft_multi_stats")
    val a = new QueryService(spark, root)
    val b = new QueryService(spark, root)
    a.ingestBatch(batch("statsfirst", 4))
    b.ingestBatch(batch("statssecond", 5))
    Thread.sleep(1100)
    val sa = parse(a.handle(
      """{"op":"stats","organization_id":"org_multi"}"""))
    val sb = parse(b.handle(
      """{"op":"stats","organization_id":"org_multi"}"""))
    val da = (sa \ "database" \ "documents").extract[Int]
    val db = (sb \ "database" \ "documents").extract[Int]
    assert(da == 9 && db == 9,
      s"both instances must count all 9 docs, got a=$da b=$db")
  }
}
