package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.CurationStream

/** Incremental curation ingest: cross-batch exact + near dedup with
  * keep-first-across-time semantics, append-only state (no rewrite of
  * prior batches' files), the streaming front end, determinism. */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val baseText =
    "the service agreement covers payment terms and renewal options for the client.\n" +
      "all invoices are due within thirty days of the billing date as agreed.\n" +
      "either party may terminate the contract with ninety days written notice."
  private def nearDup(tag: String) = baseText + s"\nappendix note $tag."
  private def unique(i: Int) =
    s"document number $i describes an entirely different topic about subject $i.\n" +
      s"it contains its own distinct second line with material unique to item $i.\n" +
      s"a third line keeps it past the minimum word count for the line cleaner $i."

  private def tmp() =
    Files.createTempDirectory("graft_curation_stream").toString

  private def listFiles(dir: String): Set[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Set.empty
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).map[String](_.toString)
        .toArray.map(_.toString).toSet
      finally s.close()
    }
  }

  test("cross-batch exact and near dups drop; keep-first across time; state appends only") {
    val state = tmp()
    // batch 1: two uniques + the base doc
    val n1 = CurationStream.curateBatch(
      Seq((1L, baseText), (2L, unique(2)), (3L, unique(3)))
        .toDF("id", "text"), state)
    assert(n1 == 3L, s"batch1 survivors $n1")
    val filesAfter1 = listFiles(state)

    // batch 2: exact dup of doc 1 (id 10), near-dup of doc 1 (id 11),
    // intra-batch near pair (12 < 13 — 13 drops), one unique (14)
    val n2 = CurationStream.curateBatch(
      Seq((10L, baseText), (11L, nearDup("x")),
        (12L, unique(12) + "\nshared tail line for the pair here okay."),
        (13L, unique(12) + "\nshared tail line for the pair here yes."),
        (14L, unique(14)))
        .toDF("id", "text"), state)
    assert(n2 == 2L, s"batch2 survivors $n2") // 12 and 14
    // batch 1's files were not rewritten
    assert(filesAfter1.subsetOf(listFiles(state)))

    // batch 3: near-dup of the batch-2 survivor 12 — still caught
    val n3 = CurationStream.curateBatch(
      Seq((20L, unique(12) + "\nshared tail line for the pair here now."))
        .toDF("id", "text"), state)
    assert(n3 == 0L, s"batch3 survivors $n3")

    val ids = spark.read.parquet(s"$state/docs").select($"id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 12L, 14L), ids.toString)
  }

  test("the streaming front drains a JSONL directory through the same path") {
    val state = tmp(); val in = tmp(); val ckpt = tmp()
    def jesc(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\n", "\\n") + "\""
    def dropJ(name: String, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(s"$in/$name"), rows.map { case (i, t) =>
        s"""{"id": $i, "text": ${jesc(t)}}"""
      }.mkString("\n"))

    dropJ("b1.jsonl", Seq((1L, baseText), (2L, unique(2))))
    CurationStream.curateStream(
      CurationStream.readDocs(spark, in), state, ckpt)
      .start().awaitTermination()
    dropJ("b2.jsonl", Seq((10L, baseText), (11L, unique(11))))
    CurationStream.curateStream(
      CurationStream.readDocs(spark, in), state, ckpt)
      .start().awaitTermination()

    val ids = spark.read.parquet(s"$state/docs").select($"id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L), ids.toString)
  }

  test("gopher gate drops junk before any state write") {
    val state = tmp()
    val junk = "zz xx qq ww " * 4 // short, no stopwords, symbol-free junk
    val n = CurationStream.curateBatch(
      Seq((1L, baseText), (2L, junk)).toDF("id", "text"), state,
      CurationStream.Cfg(gopherWordBounds = Some((20, 100000))))
    assert(n == 1L)
    val ids = spark.read.parquet(s"$state/docs").select($"id")
      .as[Long].collect().toSet
    assert(ids == Set(1L))
    // the rejected doc's bands never entered the state either
    val bandIds = spark.read.parquet(s"$state/bands").select($"id")
      .as[Long].collect().toSet
    assert(bandIds == Set(1L))
  }

  test("checkpoint blocks release deterministically: storage entries flat across 20 micro-batches") {
    val state = tmp()
    def persisted(): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    def storedBlocks(): Int =
      spark.sparkContext.getRDDStorageInfo.map(_.numCachedPartitions).sum
    val before = persisted()
    val blocksBefore = storedBlocks()
    // mixed batches: survivors, dups, near-dups — every path that
    // materializes a localCheckpoint (survivors + survivor bands)
    for (b <- 0 until 20) {
      val rows = Seq(
        (1000L + b * 10, unique(1000 + b)),            // fresh survivor
        (1001L + b * 10, baseText),                    // dup after batch 0
        (1002L + b * 10, nearDup(s"r$b")))             // near-dup after batch 0
      CurationStream.curateBatch(rows.toDF("id", "text"), state)
      val leaked = persisted() -- before
      assert(leaked.isEmpty,
        s"batch $b stranded RDD blocks: $leaked — CurationOutcome.release " +
          "must unpersist the localCheckpoint RDDs (Dataset.unpersist can't)")
    }
    assert(storedBlocks() <= blocksBefore,
      "no new cached partitions may remain after 20 released batches")
  }

  test("scoped mode rejects null scopes instead of silently unscoping them") {
    val state = tmp()
    val rows = Seq((1L, baseText, "orgA"), (2L, unique(2), null))
      .toDF("id", "text", "scope")
    val n = CurationStream.curateBatch(rows, state)
    assert(n == 1L, "the null-scope row must be quarantined, not curated")
    val ids = spark.read.parquet(s"$state/docs").select($"id")
      .as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("auto-compaction folds the state once the delta file count crosses the threshold") {
    val state = tmp(); val in = tmp(); val ckpt = tmp()
    def jesc(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\n", "\\n") + "\""
    def dropJ(name: String, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(s"$in/$name"), rows.map { case (i, t) =>
        s"""{"id": $i, "text": ${jesc(t)}}"""
      }.mkString("\n"))
    val cfg = CurationStream.Cfg(autoCompactMinDeltaFiles = 3)
    for (b <- 0 until 4) {
      dropJ(s"b$b.jsonl", Seq((100L + b) -> unique(100 + b)))
      CurationStream.curateStream(
        CurationStream.readDocs(spark, in), state, ckpt, cfg)
        .start().awaitTermination()
    }
    val m = CurationStream.readStateManifest(spark, state)
    assert(m.isDefined, "4 one-file batches over threshold 3 must have compacted")
    // dedup semantics intact post-auto-compaction
    assert(CurationStream.curateBatch(
      Seq(200L -> unique(100), 201L -> unique(201)).toDF("id", "text"),
      state, cfg) == 1L)
  }

  test("deterministic: same batches, same survivors and state keys") {
    def run(): Set[(Long, String)] = {
      val state = tmp()
      CurationStream.curateBatch(
        Seq((1L, baseText), (2L, unique(2))).toDF("id", "text"), state)
      CurationStream.curateBatch(
        Seq((10L, nearDup("q")), (11L, unique(11))).toDF("id", "text"), state)
      spark.read.parquet(s"$state/keys")
        .as[(Long, String)].collect().toSet
    }
    assert(run() == run())
  }

  test("state identity fence: layout knobs refuse, behavior knobs pass") {
    val state = tmp()
    CurationStream.curateBatch(
      Seq((1L, unique(1)), (2L, unique(2))).toDF("id", "text"), state,
      CurationStream.Cfg(bands = 4, rows = 4))
    assert(Files.exists(Paths.get(state, "_identity")), "first batch stamps")
    // state-BREAKING: a changed band layout must fail loudly — old
    // band rows and new batches would otherwise probe disjoint key
    // spaces (silent near-dup recall loss against pre-change state)
    val e = intercept[IllegalStateException] {
      CurationStream.curateBatch(
        Seq((3L, unique(3))).toDF("id", "text"), state,
        CurationStream.Cfg(bands = 8, rows = 2))
    }
    assert(e.getMessage.contains("dedup identity"))
    // behavior knobs (threshold, line cleaner, gopher, prune) are
    // compatible: the batch runs and the state still dedups
    val n = CurationStream.curateBatch(
      Seq((4L, unique(1)), (5L, unique(5))).toDF("id", "text"), state,
      CurationStream.Cfg(bands = 4, rows = 4, jaccardThreshold = 0.9,
        minWordsPerLine = 2, statePruneMinBytes = 0L))
    assert(n == 1L, "exact dup of doc 1 must still drop; fresh doc survives")
  }

  test("identity fence: torn stamp recovers; wiped state dir re-stamps") {
    val state = tmp()
    // torn stamp: a crash between create and close leaves an empty
    // _identity — never a valid identity; the fence must re-stamp
    // instead of bricking the dir with a mismatch error
    Files.write(Paths.get(state, "_identity"), Array.emptyByteArray)
    CurationStream.curateBatch(
      Seq((1L, unique(1))).toDF("id", "text"), state,
      CurationStream.Cfg(bands = 4, rows = 4))
    val stamped = new String(
      Files.readAllBytes(Paths.get(state, "_identity")), "UTF-8")
    assert(stamped.startsWith("{") && stamped.endsWith("}"),
      s"torn stamp not rewritten: '$stamped'")
    // external wipe-and-recreate inside one JVM: the per-process cache
    // must not trust the stale verification — the fresh dir is
    // re-stamped (and so stays fenced against a later layout change)
    val walk = Files.walk(Paths.get(state))
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(Files.delete(_))
    finally walk.close()
    CurationStream.curateBatch(
      Seq((2L, unique(2))).toDF("id", "text"), state,
      CurationStream.Cfg(bands = 4, rows = 4))
    assert(Files.exists(Paths.get(state, "_identity")),
      "recreated state dir was not re-stamped")
  }

  test("migrateIdentity: re-band 4x4 -> 8x2 preserves dedup recall and scope") {
    val old = tmp()
    val cfg44 = CurationStream.Cfg(bands = 4, rows = 4,
      statePruneMinBytes = 0L)
    // scoped seed: orgA curates the base doc + a unique; compact so the
    // migration reads through the tier view, then one more delta batch
    CurationStream.curateBatch(
      Seq((1L, baseText, "orgA"), (2L, unique(2), "orgA"))
        .toDF("id", "text", "scope"), old, cfg44)
    CurationStream.compactState(spark, old)
    CurationStream.curateBatch(
      Seq((3L, unique(3), "orgA")).toDF("id", "text", "scope"), old, cfg44)

    val fresh = tmp() + "/migrated"
    val cfg82 = CurationStream.Cfg(bands = 8, rows = 2)
    val banded = CurationStream.migrateIdentity(spark, old, fresh, cfg82)
    assert(banded == 3L, s"banded docs $banded")
    // docs/keys carried over; identity stamped with the new layout
    assert(spark.read.parquet(s"$fresh/docs").count() == 3L)
    val stamp = new String(
      Files.readAllBytes(Paths.get(fresh, "_identity")), "UTF-8")
    assert(stamp.contains("\"bands\":8") && stamp.contains("\"rows\":2"), stamp)

    // resuming with the OLD layout on the migrated state must refuse
    val e = intercept[IllegalStateException] {
      CurationStream.curateBatch(
        Seq((90L, unique(90), "orgA")).toDF("id", "text", "scope"),
        fresh, cfg44)
    }
    assert(e.getMessage.contains("dedup identity"))

    // resumed at 8x2: exact copy of a pre-migration orgA survivor drops
    // (migrated keys), a NEAR dup drops (re-derived band index at the
    // new layout), orgB's identical copy SURVIVES (scope prefix
    // recovered from the old band keys), a fresh doc survives
    val n = CurationStream.curateBatch(
      Seq((10L, baseText, "orgA"), (11L, nearDup("m"), "orgA"),
        (12L, baseText, "orgB"), (13L, unique(13), "orgA"))
        .toDF("id", "text", "scope"), fresh, cfg82)
    assert(n == 2L, s"post-migration survivors $n")
    val ids = spark.read.parquet(s"$fresh/docs").select($"id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 12L, 13L), ids.toString)

    // migrating into a non-empty dir refuses
    val e2 = intercept[IllegalStateException] {
      CurationStream.migrateIdentity(spark, old, fresh, cfg82)
    }
    assert(e2.getMessage.contains("non-empty"))
  }

  test("identity fence: torn stamp over NON-EMPTY state refuses loudly") {
    val state = tmp()
    CurationStream.curateBatch(
      Seq((1L, unique(1))).toDF("id", "text"), state,
      CurationStream.Cfg(bands = 4, rows = 4))
    // simulate a crash that tore the stamp AFTER state rows landed: the
    // crashed writer's layout is unknown, so re-stamping with THIS
    // run's identity would mask the exact mismatch the fence catches
    // (drop the Hadoop CRC sidecar first — an out-of-band NIO overwrite
    // against the fs.create-written stamp would otherwise surface as a
    // ChecksumException instead of exercising the torn-content branch)
    Files.deleteIfExists(Paths.get(state, "._identity.crc"))
    Files.write(Paths.get(state, "_identity"), "{\"minhash".getBytes("UTF-8"))
    // simulate a fresh process: the per-process verification memo would
    // otherwise short-circuit the stamp read (by-design, one probe)
    CurationStream.resetIdentityMemoForTest()
    val e = intercept[IllegalStateException] {
      CurationStream.curateBatch(
        Seq((2L, unique(2))).toDF("id", "text"), state,
        CurationStream.Cfg(bands = 4, rows = 4))
    }
    assert(e.getMessage.contains("non-empty state"), e.getMessage)
  }
}
