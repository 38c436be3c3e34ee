package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.streaming.CurationStream

/** Compacted curation-state tier (the LSM read path): identical dedup
  * semantics before/after compaction, exactly-once absorption of delta
  * files (a file both absorbed and still on disk is never
  * double-counted — duplicated toks rows would skew Jaccard sizes),
  * bucket pruning in the tier scan, and re-compaction across
  * generations. */
class StateCompactionSpec extends SparkSpec {
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
    Files.createTempDirectory("graft_state_compact").toString

  private def batch(rows: Seq[(Long, String)]) =
    rows.toDF("id", "text")

  private def survivorIds(state: String, rows: Seq[(Long, String)],
                          cfg: CurationStream.Cfg = CurationStream.Cfg())
      : Set[Long] = {
    val s = CurationStream.curateSurvivors(batch(rows), state, cfg)
    val ids = s.select("id").collect().map(_.getLong(0)).toSet
    s.unpersist(false)
    ids
  }

  /** Force the pruned tier-read path regardless of tier size. */
  private val forcePrune = CurationStream.Cfg(statePruneMinBytes = 0L)

  test("compaction preserves dedup semantics exactly (twin-state comparison)") {
    val plain = tmp(); val compacted = tmp()
    val b1 = Seq(1L -> baseText, 2L -> unique(2))
    val b2 = Seq(3L -> unique(3), 4L -> nearDup("alpha"))
    for (st <- Seq(plain, compacted)) {
      assert(survivorIds(st, b1) == Set(1L, 2L))
      assert(survivorIds(st, b2) == Set(3L)) // 4 near-dups doc 1
    }
    CurationStream.compactState(spark, compacted)
    assert(CurationStream.readStateManifest(spark, compacted).exists(_.gen == 1))
    // probe batch exercising every state table: an exact redelivery of
    // doc 2 (keys), a near-dup of doc 1 (bands + toks), same-batch
    // near-dup pair (7 < 8 keeps 7), and a unique survivor
    val b3 = Seq(5L -> unique(2), 6L -> nearDup("beta"),
      7L -> unique(70), 8L -> (unique(70) + "\nsmall tail difference here."),
      9L -> unique(9))
    val fromPlain = survivorIds(plain, b3)
    // FORCED bucket pruning (the tier is far below PruneMinBytes, so
    // the default path reads it whole — this exercises the collect +
    // partition-filter path end-to-end)
    val fromCompacted = survivorIds(compacted, b3, forcePrune)
    assert(fromPlain == fromCompacted,
      s"compacted state diverged: $fromPlain vs $fromCompacted")
    assert(fromCompacted == Set(7L, 9L))
  }

  test("absorbed delta files are excluded even when GC left them on disk") {
    val state = tmp()
    assert(survivorIds(state, Seq(10L -> baseText, 11L -> unique(11))) ==
      Set(10L, 11L))
    // capture the keys/toks delta files compaction will absorb (and GC)
    def dataFiles(kind: String): Map[String, Array[Byte]] = {
      val dir = Paths.get(s"$state/$kind")
      val s = Files.list(dir)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .map(p => p.getFileName.toString -> Files.readAllBytes(p)).toMap
      finally s.close()
    }
    val keysBefore = dataFiles("keys")
    val toksBefore = dataFiles("toks")
    CurationStream.compactState(spark, state)
    val m = CurationStream.readStateManifest(spark, state).get
    assert(m.absorbedKeys.toSet == keysBefore.keySet)
    // simulate a failed GC delete: restore the absorbed files verbatim
    (keysBefore.map(("keys", _)) ++ toksBefore.map(("toks", _))).foreach {
      case (kind, (name, bytes)) =>
        Files.write(Paths.get(s"$state/$kind/$name"), bytes)
    }
    // the restored files must NOT be read again: key count stays exact
    val keys = CurationStream.readState(spark, state, "keys",
      CurationStream.keysSchema, Some(m), None)
    assert(keys.count() == 2L)
    assert(keys.select("id").distinct().count() == 2L)
    assert(CurationStream.readState(spark, state, "toks",
      CurationStream.toksSchema, Some(m), None).count() == 2L)
    // and dedup semantics still hold through the full path (a doubled
    // toks row would change Jaccard sizes)
    assert(survivorIds(state, Seq(12L -> nearDup("gamma"), 13L -> unique(13)))
      == Set(13L))
  }

  test("tier scan is bucket-pruned; re-compaction absorbs later deltas with one-generation GC grace") {
    val state = tmp()
    survivorIds(state,
      (20L -> baseText) +: (21L to 40L).map(i => i -> unique(i.toInt)))
    CurationStream.compactState(spark, state)
    val m1 = CurationStream.readStateManifest(spark, state).get
    // adaptive sizing: a KB-scale state gets the bucket floor, not the
    // 64-way fan-out (192 small files cost ~+1 s/batch at toy scale —
    // endurance-run finding); the manifest carries the count so reads
    // always match the write
    assert(m1.tierBuckets.contains(CurationStream.MinStateBuckets), m1.tierBuckets)
    val pruned = CurationStream.readState(spark, state, "keys",
      CurationStream.keysSchema, Some(m1), Some(Seq(0L, 1L, 2L)))
    val plan = pruned.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*bucket""".r.findFirstIn(plan).isDefined,
      s"expected a NON-EMPTY partition filter on bucket in:\n$plan")
    // a reader still holding generation-1 frames across the next flip:
    // with the one-generation GC grace its tier (and its un-absorbed
    // delta files) must survive a concurrent compaction
    val oldReader = CurationStream.readState(spark, state, "keys",
      CurationStream.keysSchema, Some(m1), None)
    // second generation: new batch -> new delta -> compact again
    survivorIds(state, Seq(41L -> unique(41), 42L -> unique(42)))
    CurationStream.compactState(spark, state)
    val m2 = CurationStream.readStateManifest(spark, state).get
    assert(m2.gen == 2)
    // grace: v1 retained through the v2 flip, deleted only at v3
    assert(Files.exists(Paths.get(s"$state/_compacted/v1")))
    assert(oldReader.count() == 21L,
      "a generation-1 reader must survive the v2 flip")
    val all = CurationStream.readState(spark, state, "keys",
      CurationStream.keysSchema, Some(m2), None)
    assert(all.count() == 23L) // 21 + 2, each exactly once
    // post-compaction semantics: exact redelivery + a near-dup of a
    // doc absorbed through BOTH tier generations both drop
    assert(survivorIds(state,
      Seq(43L -> unique(41), 44L -> nearDup("delta"), 45L -> unique(45)))
      == Set(45L))
    CurationStream.compactState(spark, state)
    val m3 = CurationStream.readStateManifest(spark, state).get
    assert(m3.gen == 3)
    assert(!Files.exists(Paths.get(s"$state/_compacted/v1")),
      "the grace is ONE generation: v1 must be gone after the v3 flip")
    assert(Files.exists(Paths.get(s"$state/_compacted/v2")))
    assert(CurationStream.readState(spark, state, "keys",
      CurationStream.keysSchema, Some(m3), None).count() == 24L)
  }

  test("two compactions racing: exactly one wins the lease, state stays sound") {
    val state = tmp()
    survivorIds(state, (60L to 75L).map(i => i -> unique(i.toInt)))
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        gate.await()
        try { CurationStream.compactState(spark, state); outcomes.add("ok") }
        catch {
          case e: IllegalStateException if e.getMessage.contains("single-writer") =>
            outcomes.add("lease")
          case scala.util.control.NonFatal(e) =>
            outcomes.add(s"unexpected: $e")
        }
      }, s"compact-race-$i")
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val res = outcomes.toArray.map(_.toString).sorted.toSeq
    // both may serialize cleanly (ok+ok: the loser started after the
    // winner released) but NEVER two concurrent holders or a crash
    assert(res.forall(r => r == "ok" || r == "lease"), res.toString)
    assert(res.contains("ok"), res.toString)
    // the state is intact and maintains dedup semantics afterwards
    val m = CurationStream.readStateManifest(spark, state).get
    assert(CurationStream.readState(spark, state, "keys",
      CurationStream.keysSchema, Some(m), None).count() == 16L)
    assert(survivorIds(state, Seq(80L -> unique(60), 81L -> unique(81)))
      == Set(81L))
  }

  test("the compaction lease enforces the single-writer contract") {
    val state = tmp()
    survivorIds(state, Seq(50L -> unique(50)))
    // a live concurrent holder: the lock file exists with a fresh
    // timestamp (empty lock → mtime fallback, which is now)
    Files.createFile(Paths.get(s"$state/_compaction.lock"))
    val e = intercept[IllegalStateException] {
      CurationStream.compactState(spark, state)
    }
    assert(e.getMessage.contains("single-writer"))
    Files.delete(Paths.get(s"$state/_compaction.lock"))
    CurationStream.compactState(spark, state) // lock released -> proceeds
    assert(CurationStream.readStateManifest(spark, state).exists(_.gen == 1))
    // the lease is removed on completion
    assert(!Files.exists(Paths.get(s"$state/_compaction.lock")))
  }

  test("an empty fold is a no-op; an explicit re-bucket still folds") {
    val state = tmp()
    survivorIds(state, Seq(90L -> unique(90), 91L -> unique(91)))
    CurationStream.compactState(spark, state)
    val m1 = CurationStream.readStateManifest(spark, state).get
    // nothing new to fold → the generation must NOT advance: an empty
    // fold would rewrite the whole tier and burn a GC-grace window,
    // deleting files under same-generation readers for zero benefit
    CurationStream.compactState(spark, state)
    assert(CurationStream.readStateManifest(spark, state).get.gen == m1.gen)
    // but a re-bucket request is a real change and folds
    CurationStream.compactState(spark, state,
      targetBuckets = Some(m1.buckets + 3))
    val m2 = CurationStream.readStateManifest(spark, state).get
    assert(m2.gen == m1.gen + 1 && m2.buckets == m1.buckets + 3)
    assert(survivorIds(state, Seq(95L -> unique(90), 96L -> unique(96)))
      == Set(96L))
  }

  test("tier GC is a self-healing sweep: a crashed predecessor's orphaned generations are removed") {
    val state = tmp()
    assert(survivorIds(state, Seq(100L -> unique(100))) == Set(100L))
    CurationStream.compactState(spark, state) // gen 1
    // litter a crashed predecessor could leave behind:
    //  - v0 with a data-shaped file: a generation whose GC delete was
    //    skipped (crash between manifest flip and GC). The naive
    //    per-flip GC would never revisit it — flip n+1 deletes v{n-1},
    //    not v{n-2} — so it leaked FOREVER.
    //  - v9 partial: a compactor that crashed MID-FOLD at a future
    //    generation. Invisible to readers (the manifest still points at
    //    the old gen) and overwritten by the next fold to reach it; the
    //    sweep must leave it alone (only ≤ gen-2 is out of grace).
    val orphan = Paths.get(state, "_compacted", "v0", "keys")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("litter.parquet"), Array[Byte](1, 2, 3))
    Files.createDirectories(Paths.get(state, "_compacted", "v9", "toks"))
    def gens: Seq[String] = {
      val d = Paths.get(state, "_compacted").toFile.list()
      if (d == null) Nil else d.toSeq.sorted
    }
    // reads ignore the litter entirely (tier reads go via the manifest)
    assert(survivorIds(state, Seq(101L -> unique(101))) == Set(101L))
    // second fold → gen 2; the sweep removes v0 (out of grace), keeps
    // v1 (one-generation grace), v2 (live) — and v9 (a future gen)
    CurationStream.compactState(spark, state)
    assert(CurationStream.readStateManifest(spark, state).get.gen == 2)
    assert(gens == Seq("v1", "v2", "v9"), s"after flip-path sweep: $gens")
    // the NO-OP path sweeps too: a quiesced state never folds again,
    // so this is the only GC a missed delete would ever get
    Files.createDirectories(Paths.get(state, "_compacted", "v0"))
    CurationStream.compactState(spark, state) // nothing to fold
    assert(CurationStream.readStateManifest(spark, state).get.gen == 2)
    assert(gens == Seq("v1", "v2", "v9"), s"after no-op-path sweep: $gens")
    // semantics intact throughout
    assert(survivorIds(state,
      Seq(102L -> unique(100), 103L -> unique(103))) == Set(103L))
  }

  test("a crashed compaction's stale lock is taken over; a held lease degrades, never poisons") {
    val state = tmp()
    val auto = CurationStream.Cfg(autoCompactMinDeltaFiles = 1)
    val lock = Paths.get(s"$state/_compaction.lock")

    // --- crashed holder: owner+timestamp in the lock, long past TTL.
    // The next curateBatch must BOTH ingest and compact — no manual
    // lock removal (the r11 wedge: crash → restart → every batch
    // failed until an operator deleted the lock by hand).
    Files.createDirectories(Paths.get(state))
    Files.write(lock, "dead-owner-uuid 1000".getBytes("UTF-8"))
    // a real crashed holder's mtime is as old as its last heartbeat;
    // a FRESH mtime with an ancient content ts is the torn-read shape,
    // which the lease deliberately refuses to take over
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(1000))
    assert(CurationStream.curateBatch(
      batch(Seq(1L -> unique(1))), state, auto) == 1L)
    val m1 = CurationStream.readStateManifest(spark, state)
    assert(m1.exists(_.gen >= 1), "stale lock must be taken over, not wedge")
    assert(!Files.exists(lock), "takeover's own lease is released on completion")

    // --- legacy empty lock aged past TTL: mtime fallback takes over too
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(1000))
    assert(CurationStream.curateBatch(
      batch(Seq(2L -> unique(2))), state, auto) == 1L)
    assert(CurationStream.readStateManifest(spark, state).get.gen
      > m1.get.gen, "aged empty lock must also be reclaimed")
    assert(!Files.exists(lock))

    // --- live holder (fresh lock): maintenance skips, the batch still
    // lands — compaction failure must not fail a committed batch
    Files.write(lock,
      s"live-owner-uuid ${System.currentTimeMillis()}".getBytes("UTF-8"))
    val genHeld = CurationStream.readStateManifest(spark, state).get.gen
    assert(CurationStream.curateBatch(
      batch(Seq(3L -> unique(3))), state, auto) == 1L)
    assert(CurationStream.readStateManifest(spark, state).get.gen == genHeld,
      "a held lease skips compaction instead of failing the batch")
    assert(Files.exists(lock), "a live holder's lock is left alone")

    // --- holder releases: the very next batch folds the backlog
    Files.delete(lock)
    assert(CurationStream.curateBatch(
      batch(Seq(4L -> unique(4))), state, auto) == 1L)
    assert(CurationStream.readStateManifest(spark, state).get.gen > genHeld,
      "the skipped fold re-triggers once the lease frees")
    // dedup semantics intact across all four regimes
    assert(survivorIds(state, Seq(10L -> unique(1), 11L -> unique(11)))
      == Set(11L))
  }
}
