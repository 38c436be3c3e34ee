package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CurationStream

/** Cross-process single-writer rehearsal: two SEPARATE JVM drivers
  * race [[CurationStream.curateBatch]] (with auto-compaction on) and
  * [[CurationStream.compactState]] against ONE shared state dir — the
  * layer the in-process CyclicBarrier spec cannot reach. The lock
  * file's create-if-absent is atomic on the local FS via NIO O_EXCL
  * (and on HDFS server-side), so the expected outcome is one winner
  * per cycle, lease failures surfacing as clean skips, and a sound
  * state afterwards.
  *
  * Driven by tools/cross_process_race.sh; each role prints ONE JSON
  * line.
  *
  *  - `curate <state> curate <nBatches> <idOffset>`: n micro-batches
  *    of unique synthetic docs with autoCompactMinDeltaFiles=2 — every
  *    batch both appends AND attempts the maintenance fold (lease
  *    failures degrade to skips by contract).
  *  - `compact <state> compact <nAttempts>`: hammer compactState
  *    directly, 150 ms apart, counting ok / lease-denied / unexpected.
  *  - `verify <state> verify`: post-race invariants — keys-view count
  *    equals docs count (no double-counted or lost delta), an exact
  *    copy of a survivor still drops (dedup semantics), no lock file
  *    left behind, manifest generation present.
  */
object CrossProcessRace {
  def main(args: Array[String]): Unit = {
    val stateDir = args(0)
    val role = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def synthetic(n: Int, offset: Long) = spark.range(n)
      .select((col("id") + offset).as("id"),
        concat(concat_ws(" ", transform(sequence(lit(1), lit(40)),
          j => substring(md5(concat(col("id"), lit("_"), j)), 1, 8))),
          lit(" end.")).as("text"))

    role match {
      case "curate" =>
        val nBatches = args(2).toInt
        val offset = args(3).toLong
        val cfg = CurationStream.Cfg(autoCompactMinDeltaFiles = 2)
        var appended = 0L
        val secs = (1 to nBatches).map { i =>
          val t0 = System.nanoTime()
          appended += CurationStream.curateBatch(
            synthetic(40, offset + i * 10000L), stateDir, cfg)
          (System.nanoTime() - t0) / 1e9
        }
        println(s"""{"curate":{"batches":$nBatches,"appended":$appended,""" +
          s""""batch_secs":[${secs.map(s => f"$s%.2f").mkString(",")}]}}""")
      // one bulk batch of n synthetic docs — sizes a state so a fold
      // takes long enough for the crash rehearsal to SIGKILL it mid-
      // flight (tools/compaction_crash_rehearsal.sh)
      case "seed" =>
        val n = args(2).toInt
        val offset = if (args.length > 3) args(3).toLong else 0L
        val appended = CurationStream.curateBatch(
          synthetic(n, offset), stateDir)
        println(s"""{"seed":{"docs":$n,"appended":$appended}}""")
      // ONE compaction attempt with a caller-chosen lock TTL — the
      // crash rehearsal's recovery step (take over a killed peer's
      // stale lock without waiting the production 30 min)
      case "compactonce" =>
        val ttl = if (args.length > 2) args(2).toLong
          else CurationStream.CompactionLockTtlMs
        val r =
          try {
            CurationStream.compactState(spark, stateDir, lockTtlMs = ttl)
            "\"ok\""
          } catch {
            case e: IllegalStateException
                if Option(e.getMessage).exists(_.contains("single-writer")) => "\"lease_denied\""
            case scala.util.control.NonFatal(e) =>
              s""""unexpected: ${e.getClass.getSimpleName}""""
          }
        val gen = CurationStream.readStateManifest(spark, stateDir)
          .map(_.gen).getOrElse(0)
        println(s"""{"compactonce":{"result":$r,"gen":$gen}}""")
      case "compact" =>
        val nAttempts = args(2).toInt
        var ok, lease, other = 0
        (1 to nAttempts).foreach { _ =>
          try { CurationStream.compactState(spark, stateDir); ok += 1 }
          catch {
            case e: IllegalStateException
                if Option(e.getMessage).exists(_.contains("single-writer")) => lease += 1
            case scala.util.control.NonFatal(e) =>
              other += 1
              System.err.println(s"[race] unexpected: $e")
          }
          Thread.sleep(150)
        }
        println(s"""{"compact":{"attempts":$nAttempts,"ok":$ok,""" +
          s""""lease_denied":$lease,"unexpected":$other}}""")
      case "verify" =>
        val docs = spark.read.parquet(s"$stateDir/docs")
        val nDocs = docs.count()
        val m = CurationStream.readStateManifest(spark, stateDir)
        val nKeys = CurationStream.readState(spark, stateDir, "keys",
          CurationStream.keysSchema, m, None).count()
        // exact copy of an existing survivor must drop through
        // whatever tier/delta shape the race left behind
        val survivor = docs.orderBy("id").limit(1).collect()(0)
        val dup = spark.createDataFrame(java.util.Arrays.asList(
            org.apache.spark.sql.Row(99999999999L, survivor.getString(1))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
        val dupSurvived = CurationStream.curateBatch(dup, stateDir)
        val lockLeft = new java.io.File(
          s"$stateDir/_compaction.lock").exists()
        println(s"""{"verify":{"docs":$nDocs,"keys_view":$nKeys,""" +
          s""""keys_match_docs":${nKeys == nDocs},""" +
          s""""dup_dropped":${dupSurvived == 0L},""" +
          s""""gen":${m.map(_.gen).getOrElse(0)},""" +
          s""""lock_left":$lockLeft}}""")
      // ---- serving-store race (tools/serve_race.sh): two JVMs each
      // run a QueryService over ONE store root and ingest concurrently;
      // the `_store.lock` mutation lease + pre-mutation rebase must
      // compose every flip (no lost segments), and the post-race
      // verifier must find every document from both writers.
      case "serve" =>
        val nBatches = args(2).toInt
        val tag = args(3)
        val svc = new graft.serve.QueryService(spark, stateDir)
        var chunks = 0L
        val secs = (1 to nBatches).map { i =>
          val docs = spark.range(20).select(
            concat(lit(s"${tag}_b${i}_"), col("id"), lit(".md"))
              .as("filename"),
            concat(lit("Serve race document "), col("id"),
              lit(s" of batch $i from $tag carrying marker ${tag}mark$i " +
                "plus steady shared retrieval vocabulary for indexing."))
              .as("text"),
            lit("org_race").as("organization_id"))
          val t0 = System.nanoTime()
          chunks += svc.ingestBatch(docs)
          (System.nanoTime() - t0) / 1e9
        }
        println(s"""{"serve":{"tag":"$tag","batches":$nBatches,""" +
          s""""chunks":$chunks,""" +
          s""""batch_secs":[${secs.map(s => f"$s%.2f").mkString(",")}]}}""")
      // ---- streaming crash rehearsal (tools/stream_crash_rehearsal.sh):
      // drain a JSONL directory through the COMPOSED curate→serve
      // stream (one file per micro-batch) until AvailableNow exhausts
      // it; the rehearsal SIGKILLs this mid-batch and restarts it on
      // the same checkpoint to prove the replay seam end-to-end.
      case "streamdrain" =>
        val docsDir = args(2)
        val checkpoint = args(3)
        val store = args(4)
        // optional upgrade-rehearsal knobs: args(5) = bands override
        // (state-BREAKING — the identity fence must refuse a changed
        // value on an existing state), args(6) = "minW:maxW" Gopher
        // gate (behavior knob — compatible across restarts), args(7) =
        // rows override (bands×rows must not exceed minhashK=16 — the
        // re-band rehearsal resumes at bands=8 rows=2)
        val bands = if (args.length > 5) args(5).toInt else 4
        val gopher = if (args.length > 6 && args(6) != "-") {
          val Array(a, b) = args(6).split(":"); Some((a.toInt, b.toInt))
        } else None
        val rows = if (args.length > 7) args(7).toInt else 4
        val svc = new graft.serve.QueryService(spark, store)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("filename",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("organization_id",
            org.apache.spark.sql.types.StringType)))
        val docs = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(docsDir)
        val q = CurationStream.curateToServeStream(svc, docs, stateDir,
          checkpoint, CurationStream.Cfg(autoCompactMinDeltaFiles = 4,
            bands = bands, rows = rows, gopherWordBounds = gopher))
          .start()
        q.awaitTermination()
        println(s"""{"streamdrain":{"done":true}}""")
      // offline re-band migration (tools/reband_migration_rehearsal.sh):
      // rebuild the band index of <state> under a new layout into
      // args(2), stamped with bands=args(3) rows=args(4)
      case "migrate" =>
        val newState = args(2)
        val bands = args(3).toInt
        val rows = args(4).toInt
        val n = CurationStream.migrateIdentity(spark, stateDir, newState,
          CurationStream.Cfg(bands = bands, rows = rows))
        println(s"""{"migrate":{"banded_docs":$n,"to":"$newState"}}""")
      case "streamverify" =>
        val store = args(2)
        val expectA = args(3).toInt
        val expectB = args(4).toInt
        val markerA = args(5)
        val markerB = args(6)
        val svc = new graft.serve.QueryService(spark, store)
        implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
        import org.json4s.jackson.JsonMethods.parse
        // stats.documents is GLOBAL (the reference's /stats shape) —
        // per-org counts come from the tenant-scoped document listing
        // (offset/limit form: a BARE array, matching api/main.py:591)
        def docsOf(org: String): Long =
          parse(svc.handle(s"""{"op":"documents","organization_id":"$org",""" +
            s""""limit":1000}""")).children.size.toLong
        def found(org: String, qq: String): Boolean =
          (parse(svc.handle(s"""{"op":"search","organization_id":"$org",""" +
            s""""query":"$qq","limit":5}""")) \ "total_results")
            .extract[Int] > 0
        val nA = docsOf("org_a"); val nB = docsOf("org_b")
        // curation-state integrity BY DISTINCT ID: the system's
        // documented worst-case crash outcome is a DUPLICATE docs row
        // (a kill between the docs append and the keys append replays
        // the batch, which re-derives the same survivors against the
        // unchanged keys and re-appends them — CurationStream's
        // docs-first ordering bounds the damage to exactly that), so
        // raw row counts may legitimately exceed the id space while
        // nothing is lost or double-served
        val stDocRows = spark.read.parquet(s"$stateDir/docs").count()
        val stDocs = spark.read.parquet(s"$stateDir/docs")
          .select("id").distinct().count()
        val m = CurationStream.readStateManifest(spark, stateDir)
        val stKeys = CurationStream.readState(spark, stateDir, "keys",
          CurationStream.keysSchema, m, None)
          .select("id").distinct().count()
        val storeLock = new java.io.File(s"$store/_store.lock").exists()
        val compLock =
          new java.io.File(s"$stateDir/_compaction.lock").exists()
        println(s"""{"streamverify":{"org_a":$nA,"org_b":$nB,""" +
          s""""counts_match":${nA == expectA && nB == expectB},""" +
          s""""found_a":${found("org_a", markerA)},""" +
          s""""found_b":${found("org_b", markerB)},""" +
          s""""state_doc_rows":$stDocRows,""" +
          s""""state_docs":$stDocs,"state_keys":$stKeys,""" +
          s""""keys_match_docs":${stKeys == stDocs},""" +
          s""""state_match_store":${stDocs == nA + nB},""" +
          s""""store_lock_left":$storeLock,""" +
          s""""compaction_lock_left":$compLock}}""")
      // one BULK ingestBatch — sizes the serving mutation so the crash
      // rehearsal can SIGKILL it between the first segment-dir write
      // and the CURRENT flip (tools/serve_crash_rehearsal.sh)
      case "servebig" =>
        val n = args(2).toInt
        val tag = args(3)
        val svc = new graft.serve.QueryService(spark, stateDir)
        val docs = spark.range(n).select(
          concat(lit(s"${tag}_big_"), col("id"), lit(".md")).as("filename"),
          concat(lit("Bulk crash rehearsal document "), col("id"),
            lit(s" from $tag with marker ${tag}bigmark and body "),
            concat_ws(" ", transform(sequence(lit(1), lit(30)),
              j => substring(md5(concat(col("id"), lit("_"), j)), 1, 8))))
            .as("text"),
          lit("org_race").as("organization_id"))
        val chunks = svc.ingestBatch(docs)
        println(s"""{"servebig":{"docs":$n,"chunks":$chunks}}""")
      case "serveverify" =>
        val expectDocs = args(2).toInt
        val tagA = args(3)
        val tagB = args(4)
        val svc = new graft.serve.QueryService(spark, stateDir)
        implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
        import org.json4s.jackson.JsonMethods.parse
        val stats = parse(svc.handle(
          """{"op":"stats","organization_id":"org_race"}"""))
        val nDocs = (stats \ "database" \ "documents")
          .extract[Long]
        def found(tag: String): Boolean =
          (parse(svc.handle(
            s"""{"op":"search","organization_id":"org_race",""" +
              s""""query":"${tag}mark1 marker","limit":5}"""))
            \ "total_results").extract[Int] > 0
        val lockLeft = new java.io.File(s"$stateDir/_store.lock").exists()
        println(s"""{"serveverify":{"docs":$nDocs,""" +
          s""""docs_match":${nDocs == expectDocs},""" +
          s""""found_a":${found(tagA)},"found_b":${found(tagB)},""" +
          s""""lock_left":$lockLeft}}""")
      case r => sys.error(s"unknown role $r")
    }
    spark.stop()
  }
}
