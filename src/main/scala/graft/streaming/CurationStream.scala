package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.{parseJson, Serialization}

import graft.functions.TextFunctions
import graft.operators.{Clean, Dedup}

/** Incremental curation ingest — the [[graft.operators.TrainingPipeline]]
  * reducers lifted to a continuous source: each arriving micro-batch of
  * raw documents is normalized, line-cleaned, exact-deduped and
  * MinHash-near-deduped against EVERYTHING CURATED SO FAR, and the
  * survivors append to the curated store — the shape a production
  * crawl pipeline actually runs (snapshots arrive forever; re-running
  * the batch pipeline corpus×corpus per snapshot is quadratic over
  * time).
  *
  * Per-batch cost is O(batch + candidate pairs), NEVER O(corpus):
  *  - cross-batch exact dedup probes the seen-key store with a
  *    BROADCAST set of the batch's md5s (the store scans, the batch
  *    builds — the only join direction that stays cheap as the store
  *    grows);
  *  - near-dedup uses [[Dedup.lshCandidatesDelta]]: batch bands join
  *    the persisted corpus band table plus the batch's own self-join
  *    (same-batch near-dups match nothing in the corpus yet);
  *  - Jaccard verification touches only candidate ids on both sides
  *    (the token store SEMI-JOINS down to the candidate id set before
  *    any shingle explode — verified flat-in-state-size by
  *    `tools.StreamBench`, pinned in BASELINE.md);
  *  - every state table (keys / bands / toks / docs) is APPEND-ONLY —
  *    a batch writes O(batch) files and rewrites nothing;
  *    [[compactState]] periodically folds the accumulated delta files
  *    into a bucket-partitioned tier (bounding file count between
  *    runs), and once a table's tier passes the prune threshold the
  *    per-batch scan reads only the batch's own key buckets — the LSM
  *    read shape that keeps state IO O(batch + delta) at a multi-GB
  *    state instead of O(state).
  *
  * Keep-first semantics across time: a doc near-matching an
  * already-curated doc drops; two near-dups in one batch keep the
  * smaller id (matching the batch pipeline's canonical-min
  * convention). Caller contract: ids are globally unique across
  * batches (document ids). Docs with <3 tokens after cleaning carry
  * no shingles and bypass near-dedup (exact dedup still applies) —
  * the batch operators' own convention. */
object CurationStream {

  case class Cfg(
      minWordsPerLine: Int = 3,
      minhashK: Int = 16,
      bands: Int = 4,
      rows: Int = 4,
      jaccardThreshold: Double = 0.8,
      // optional Gopher quality gate (q94) applied before any state
      // write — junk never enters the store or the band table
      gopherWordBounds: Option[(Int, Int)] = None,
      // a compacted state table smaller than this is read whole — the
      // bucket-prune probe's fixed cost only pays for itself against a
      // multi-GB tier (see [[PruneMinBytes]]); tests set 0 to force
      // the pruned path
      statePruneMinBytes: Long = CurationStream.PruneMinBytes)

  private[graft] val keysSchema = StructType(Seq(
    StructField("id", LongType), StructField("text_md5", StringType)))
  private val bandsSchema = StructType(Seq(
    StructField("id", LongType), StructField("band", IntegerType),
    StructField("band_key", StringType)))
  private[graft] val toksSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("toks", ArrayType(StringType))))

  // State probes via the Hadoop FileSystem (a java.io.File probe on a
  // non-local or `file:`-qualified stateDir silently reported every
  // state table missing — fresh-corpus dedup semantics against a
  // populated remote store); schema-first read: the state tables are
  // written by this object, so inference is pure overhead per batch.
  private def readOrEmpty(spark: SparkSession, path: String,
                          schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
  }

  // ---- compacted state tier (LSM shape) ----------------------------------
  //
  // Plain append-only state keeps per-batch WRITES O(batch), but every
  // batch still SCANS the full keys / bands / toks tables (columnar
  // and cheap at the tested 50k-doc states, linear all the same — at
  // 100M curated docs those scans are gigabytes per micro-batch).
  // [[compactState]] rewrites the state into a bucket-partitioned tier
  // (bucket = hash of each table's join key), after which a batch
  // reads ONLY the ≤`StateBuckets` partitions its own keys can touch
  // plus whatever delta files appended since the last compaction —
  // per-batch state IO becomes O(batch-buckets/total × tier + delta),
  // the LSM read shape, while the write path stays byte-identical.
  //
  // Exactly-once absorption: the COMPACTED manifest records, per
  // table, the delta FILE NAMES the tier has absorbed; readers list
  // the delta dir and subtract them. The flip is the same
  // write-aside + atomic-rename as SegmentedStore's CURRENT, so a
  // crash between tier write, flip and delta GC never double-counts a
  // row (duplicated toks rows would skew Jaccard sizes) and never
  // loses one. Single-writer contract: compaction runs BETWEEN
  // batches (the stream's foreachBatch is serial); it is maintenance,
  // like [[graft.sources.SegmentedStore]]'s foldSegments.

  /** Bucket count of the compacted tier. 64 keeps the per-batch
    * pruned read at ≤ batch-distinct buckets while a compaction still
    * writes only ~64 files per table. */
  val StateBuckets = 64

  /** COMPACTED manifest: tier generation + absorbed delta file names
    * per state table (names still present in the delta dir are
    * excluded from reads; deletion is best-effort GC afterwards) +
    * per-table tier bytes (the prune-engagement signal). */
  final case class StateManifest(gen: Int,
                                 absorbedKeys: List[String],
                                 absorbedBands: List[String],
                                 absorbedToks: List[String],
                                 tierBytes: Option[Map[String, Long]] = None,
                                 // minted per compaction: the tier-memo
                                 // key component that a wiped-and-
                                 // reseeded stateDir (gen restarts at 1,
                                 // dir path repeats) can never collide
                                 // on — the SegmentedStore storeId
                                 // lesson
                                 tierId: Option[String] = None) {
    def absorbed(kind: String): Set[String] = kind match {
      case "keys" => absorbedKeys.toSet
      case "bands" => absorbedBands.toSet
      case _ => absorbedToks.toSet
    }
    def bytesOf(kind: String): Long =
      tierBytes.flatMap(_.get(kind)).getOrElse(0L)
  }

  /** Tier size below which a batch reads the tier WHOLE instead of
    * bucket-pruned: the prune probe costs ~3 batch-bounded collect
    * jobs (~0.5-1 s of fixed driver overhead, StreamBench x100
    * COMPACT_STATE rehearsal), while a columnar full scan of a small
    * tier is cheaper than that — the crossover is a multi-GB tier
    * (several million curated docs), exactly the regime the tier
    * exists for. */
  val PruneMinBytes: Long = 2L << 30

  implicit private val jsonFormats: Formats = DefaultFormats

  private def hadoopFs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def readStateManifest(spark: SparkSession,
                        stateDir: String): Option[StateManifest] = {
    val (fs, p) = hadoopFs(spark, s"$stateDir/COMPACTED")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(parseJson(s).extract[StateManifest])
    }
  }

  private def writeStateManifest(spark: SparkSession, stateDir: String,
                                 m: StateManifest): Unit = {
    val (fs, root) = hadoopFs(spark, stateDir)
    fs.mkdirs(root)
    val tmp = fs.makeQualified(
      new org.apache.hadoop.fs.Path(stateDir, "COMPACTED.tmp"))
    val out = fs.create(tmp, true)
    try out.write(Serialization.write(m).getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp,
      fs.makeQualified(new org.apache.hadoop.fs.Path(stateDir, "COMPACTED")),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The bucket a state row lands in — the SAME Spark expression
    * computes the write-side partition value and the read-side probe
    * set, so the two can never disagree. */
  private def bucketExpr(kind: String): org.apache.spark.sql.Column =
    kind match {
      case "keys" => pmod(xxhash64(col("text_md5")), lit(StateBuckets.toLong))
      case "bands" => pmod(xxhash64(col("band_key")), lit(StateBuckets.toLong))
      case _ => pmod(xxhash64(col("id")), lit(StateBuckets.toLong))
    }

  /** Data files currently in a delta dir, minus `absorbed` names. */
  private def deltaFiles(spark: SparkSession, dir: String,
                         absorbed: Set[String]): Seq[String] = {
    val (fs, p) = hadoopFs(spark, dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && !absorbed.contains(n)
      })
      .map(_.getPath.toString)
  }

  // Per-(session, state, generation, table) memo of the tier base
  // frame. A tier generation's 64-bucket directory tree is IMMUTABLE
  // once its manifest is flipped, but a fresh spark.read resolves a
  // new InMemoryFileIndex — a driver-side listing of all bucket dirs —
  // on EVERY batch (measured ~0.6 s/probe across the three tables at
  // a 500k-doc state). Reusing the resolved frame reuses its file
  // index; per-batch bucket filters plan against the memo without
  // re-listing (the SegmentedStore sidecar-view-memo pattern). Bounded
  // LRU; a superseded generation's entry ages out.
  private val tierMemo =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame])
          : Boolean = size() > 12
    }

  private def tierFrame(spark: SparkSession, stateDir: String, kind: String,
                        m: StateManifest, tierSchema: StructType): DataFrame = {
    // tierId is the collision-proof key; legacy manifests without one
    // fall back to path+gen (correct within a single state lineage)
    val key = (spark, m.tierId.getOrElse(s"$stateDir#${m.gen}"), kind)
    tierMemo.synchronized {
      val hit = tierMemo.get(key)
      if (hit != null) return hit
    }
    val tierDir = s"$stateDir/_compacted/v${m.gen}/$kind"
    val df =
      if (exists(spark, tierDir))
        spark.read.schema(tierSchema).parquet(tierDir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tierSchema)
    tierMemo.synchronized { tierMemo.put(key, df) }
    df
  }

  /** One state table's current view: the compacted tier (pruned to
    * `buckets` when given — static partition pruning, the point of the
    * tier) unioned with un-absorbed delta files. Without a manifest
    * this is exactly the legacy full-dir read. */
  private[graft] def readState(spark: SparkSession, stateDir: String,
                               kind: String, schema: StructType,
                               m: Option[StateManifest],
                               buckets: Option[Seq[Long]]): DataFrame = m match {
    case None => readOrEmpty(spark, s"$stateDir/$kind", schema)
    case Some(man) =>
      val tierSchema = schema.add(StructField("bucket", LongType))
      val tier0 = tierFrame(spark, stateDir, kind, man, tierSchema)
      val tier = (buckets match {
        case Some(bs) if bs.size < StateBuckets =>
          tier0.filter(col("bucket").isin(bs: _*))
        case _ => tier0
      }).drop("bucket")
      val fresh = deltaFiles(spark, s"$stateDir/$kind", man.absorbed(kind))
      val delta =
        if (fresh.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        else spark.read.schema(schema).parquet(fresh: _*)
      tier.unionByName(delta)
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = hadoopFs(spark, dir)
    fs.exists(p)
  }

  /** Distinct tier buckets a batch-bounded frame can touch, as literal
    * values for the partition filter (None = every bucket — skip the
    * filter). The collect is bounded by `StateBuckets` rows whatever
    * the batch size. */
  private def batchBuckets(df: DataFrame, kind: String): Option[Seq[Long]] = {
    val bs = df.select(bucketExpr(kind).as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (bs.size >= StateBuckets) None else Some(bs)
  }

  /** Rewrite the full current state (previous tier + un-absorbed
    * deltas) into a fresh bucket-partitioned tier generation, flip the
    * COMPACTED manifest, then best-effort-delete the absorbed delta
    * files and the previous tier. O(state) — a scheduled maintenance
    * event whose cost amortizes over the cheap O(batch) appends
    * between runs, exactly like the serving store's segment fold. */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    val m0 = readStateManifest(spark, stateDir)
    val gen = m0.map(_.gen + 1).getOrElse(1)
    val kinds = Seq(("keys", keysSchema), ("bands", bandsSchema),
      ("toks", toksSchema))
    val compacted = kinds.map { case (kind, schema) =>
      val prevAbsorbed = m0.map(_.absorbed(kind)).getOrElse(Set.empty)
      val fresh = deltaFiles(spark, s"$stateDir/$kind", prevAbsorbed)
      val tierDir = s"$stateDir/_compacted/v$gen/$kind"
      readState(spark, stateDir, kind, schema, m0, None)
        .withColumn("bucket", bucketExpr(kind))
        .repartition(StateBuckets, col("bucket"))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(tierDir)
      val (fs, tp) = hadoopFs(spark, tierDir)
      val bytes = fs.getContentSummary(tp).getLength
      // absorbed going forward = everything this tier now contains
      // that might STILL sit in the delta dir: the fresh files, plus
      // previously-absorbed names whose GC delete failed
      val freshNames = fresh.map(f =>
        new org.apache.hadoop.fs.Path(f).getName).toSet
      val stillThere = deltaFiles(spark, s"$stateDir/$kind", Set.empty)
        .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
      kind -> ((prevAbsorbed ++ freshNames) & (stillThere ++ freshNames),
        bytes)
    }.toMap
    val absorbedNow = compacted.view.mapValues(_._1).toMap
    writeStateManifest(spark, stateDir, StateManifest(gen,
      absorbedNow("keys").toList.sorted,
      absorbedNow("bands").toList.sorted,
      absorbedNow("toks").toList.sorted,
      Some(compacted.view.mapValues(_._2).toMap),
      Some(java.util.UUID.randomUUID().toString)))
    // GC: absorbed delta files + the previous tier generation
    kinds.foreach { case (kind, _) =>
      val (fs, dir) = hadoopFs(spark, s"$stateDir/$kind")
      absorbedNow(kind).foreach { n =>
        try fs.delete(new org.apache.hadoop.fs.Path(dir, n), false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    m0.foreach { prev =>
      val (fs, p) = hadoopFs(spark, s"$stateDir/_compacted/v${prev.gen}")
      try fs.delete(p, true)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** One micro-batch through the incremental pipeline (also the
    * batch-mode entry the specs drive directly). Returns the survivor
    * count appended to `stateDir/docs`. */
  def curateBatch(batch0: DataFrame, stateDir: String,
                  cfg: Cfg = Cfg()): Long = {
    val s = curateSurvivors(batch0, stateDir, cfg)
    val n = s.count() // served from the cache the core materialized
    s.unpersist(false)
    n
  }

  /** [[curateSurvivorsDeferred]]'s result: the surviving rows (id,
    * text — plus text_md5/toks, and scope when the batch was scoped)
    * as an eagerly CHECKPOINTED, lineage-free frame, and the deferred
    * state append. `commit()` appends the survivors + their dedup
    * state (keys/bands/toks/docs) — call it AFTER any downstream
    * side-effect that a stream replay must be able to redo (the
    * curate→serve ordering), exactly once per outcome. `n` is the
    * survivor count, already paid for by the checkpoint
    * materialization — consumers branch on it instead of probing the
    * frame with their own isEmpty/count jobs. The caller unpersists
    * `survivors` to release its blocks. */
  final case class CurationOutcome(survivors: DataFrame, n: Long,
                                   commit: () => Unit)

  /** Back-compat batch core: compute survivors AND append state before
    * returning. */
  def curateSurvivors(batch0: DataFrame, stateDir: String,
                      cfg: Cfg = Cfg()): DataFrame = {
    val out = curateSurvivorsDeferred(batch0, stateDir, cfg)
    out.commit()
    out.survivors
  }

  /** The batch core with the state append DEFERRED behind
    * [[CurationOutcome]].commit — the replay-safety seam: a composed
    * consumer (curate→serve) performs its own side-effects between
    * survivor computation and the state append, so a failed/retried
    * micro-batch re-derives the same survivors against the un-mutated
    * state instead of exact-dropping them against its own prior write.
    *
    * Tenant-scoped mode: a `scope` string column on `batch0` (absent →
    * global semantics, unchanged) is folded into BOTH dedup
    * identities — the exact key becomes md5(scope ∥ text) and every
    * LSH band key is prefixed with the scope via
    * [[Dedup.lshCandidatesDeltaBanded]] — so documents only ever
    * dedup against their own scope: one tenant's upload can never
    * suppress another tenant's identical or near-dup copy (tenant
    * isolation, the reference's core invariant,
    * `tenant_schema.py:35-74`). */
  def curateSurvivorsDeferred(batch0: DataFrame, stateDir: String,
                              cfg: Cfg = Cfg()): CurationOutcome = {
    val spark = batch0.sparkSession
    val scoped = batch0.columns.contains("scope")
    if (batch0.isEmpty)
      return CurationOutcome(
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("id", LongType),
            StructField("text_md5", StringType),
            StructField("text", StringType),
            StructField("toks", ArrayType(StringType))))),
        0L, () => ())

    // 1: row-local normalize + C4 line clean (one fused pass); the
    // scoped exact key folds the scope into the md5 (NUL separator —
    // unambiguous, scopes are id-like strings)
    // Scope rides THROUGH lineClean as a passthrough column — a
    // re-attach join here cost ~0.5 s of broadcast-build jobs per
    // batch for a value the row already had
    val scopeKeep = if (scoped) Seq("scope") else Nil
    val cleaned0 = Clean.lineClean(
        batch0.select(Seq(col("id").cast("long").as("id"),
          TextFunctions.normalizeText(col("text")).as("text")) ++
          scopeKeep.map(col): _*),
        "id", "text", cfg.minWordsPerLine, keep = scopeKeep)
      .filter(col("n_kept") > 0)
    val cleaned =
      if (scoped)
        cleaned0.select(col("id"), col("cleaned").as("text"),
          md5(concat_ws("\u0000", col("scope"), col("cleaned"))).as("text_md5"),
          col("scope"))
      else cleaned0.select(col("id"), col("cleaned").as("text"),
        md5(col("cleaned")).as("text_md5"))

    // 1.5: optional Gopher quality gate (row-local verdict; the
    // batch-sized keep set broadcasts back onto the batch)
    val gated = cfg.gopherWordBounds match {
      case Some((minW, maxW)) =>
        val keep = graft.operators.Curation
          .gopherRules(cleaned, "id", "text", minW, maxW)
          .filter(col("keep")).select("id")
        cleaned.join(broadcast(keep), Seq("id"), "left_semi")
      case None => cleaned
    }

    // 2: within-batch exact keep-first (min id per md5)
    val exactB = gated.join(
      gated.groupBy("text_md5").agg(min(col("id")).as("id")),
      Seq("text_md5", "id"), "left_semi")

    // 3: cross-batch exact — the seen-key store scans, the batch's
    // md5 set broadcasts. With a compacted tier ABOVE the prune
    // threshold the scan is first PRUNED to the batch's key buckets
    // (a ≤StateBuckets-row collect per probe — paid only when the
    // tier is big enough that the skipped scan exceeds it).
    val stateM = readStateManifest(spark, stateDir)
    def prune(kind: String, probe: => DataFrame): Option[Seq[Long]] =
      if (stateM.exists(_.bytesOf(kind) >= cfg.statePruneMinBytes))
        batchBuckets(probe, kind)
      else None
    val seen = readState(spark, stateDir, "keys", keysSchema, stateM,
      prune("keys", exactB))
    val hits = seen.join(
        broadcast(exactB.select("text_md5").distinct()), "text_md5")
      .select("text_md5").distinct()
    val fresh = exactB.join(broadcast(hits), Seq("text_md5"), "left_anti")

    // 4: near-dedup vs the curated corpus + within the batch
    val toks = fresh.select(Seq(col("id"), col("text_md5"), col("text"),
        TextFunctions.wsTokens(lower(col("text"))).as("toks")) ++
        (if (scoped) Seq(col("scope")) else Nil): _*)
      .cache()
    val sigs = Dedup.minhashSignatures(toks, "id", "toks", cfg.minhashK,
      keep = scopeKeep)
    // scoped mode prefixes every band key with the scope BEFORE the
    // corpus join (the lshCandidatesDeltaBanded hook): candidates —
    // and therefore near-dup drops — only ever pair within one scope.
    // The persisted band table stores the prefixed keys, so the scoping
    // survives across batches. Scope is a row-local passthrough from
    // the signature select — the old re-attach join cost a broadcast
    // build per batch.
    val nb = (if (scoped)
        Dedup.bandTable(sigs, cfg.bands, cfg.rows, keep = scopeKeep)
          .select(col("id"), col("band"),
            concat(col("scope"), lit("|"), col("band_key")).as("band_key"))
      else Dedup.bandTable(sigs, cfg.bands, cfg.rows))
      .cache()
    val corpusBands = readState(spark, stateDir, "bands", bandsSchema, stateM,
      prune("bands", nb))
    // cached: consumed by the candIds broadcast, the verify join AND
    // (tier present) the toks bucket probe — uncached, each would
    // re-run the corpus-bands join
    val cands = Dedup
      .lshCandidatesDeltaBanded(nb, corpusBands)
      .toDF("id_a", "id_b") // id_a = batch doc; id_b = corpus OR batch
      .cache()
    // Verification must touch ONLY candidate docs: shingling the whole
    // curated store would be O(corpus) per batch. Semi-join the token
    // store down to the candidate id set (bounded by the LSH pair
    // count) before the shingle explode — and with a compacted tier,
    // prune the store read to the candidates' id buckets first.
    val candIds = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id"))).distinct()
    val allToks = toks.select("id", "toks")
      .unionByName(readState(spark, stateDir, "toks", toksSchema, stateM,
        prune("toks", candIds)))
      .join(broadcast(candIds), Seq("id"), "left_semi")
    val (verified0, releaseSh) =
      Dedup.jaccardVerifyStaged(cands, allToks, "id", "toks")
    val verified = verified0.filter(col("jaccard") >= cfg.jaccardThreshold)
    // corpus partner → the newcomer (id_a) drops; batch partner
    // (id_a < id_b by construction) → the larger (id_b) drops
    val batchIds = toks.select(col("id").as("bid"))
    val losers = verified
      .join(broadcast(batchIds), col("id_b") === col("bid"), "left")
      .select(when(col("bid").isNotNull, col("id_b"))
        .otherwise(col("id_a")).as("id")).distinct()
    // survivors and their band rows are MATERIALIZED (eager local
    // checkpoint — batch-bounded) BEFORE any state write: their plans
    // read the very paths commit() appends to, and Spark's write-path
    // cache refresh would otherwise invalidate them and re-execute
    // against the mutated state (the batch's own md5s in the key store
    // ⟹ every survivor reclassified as a dup) on the next access —
    // exactly what the composed curate→serve consumer does between
    // this return and its commit() call. A checkpoint is lineage-free,
    // so post-write evaluations are immune by construction.
    val survivors = toks.join(broadcast(losers), Seq("id"), "left_anti")
      .localCheckpoint()
    val n = survivors.count()
    val survBands =
      if (n == 0) None
      else Some(nb
        .join(broadcast(survivors.select("id")), Seq("id"), "left_semi")
        .localCheckpoint())
    toks.unpersist(false)
    nb.unpersist(false)
    cands.unpersist(false)
    // every verified-pair consumer is checkpointed above; a leaked
    // shingle cache would re-optimize on each state append (see
    // jaccardVerifyStaged's doc)
    releaseSh()

    // 5 (deferred): append survivors + their state — O(batch) writes,
    // no rewrite. Both frames are checkpointed above, so the closure
    // holds no lineage over caches or state paths.
    CurationOutcome(survivors, n, () =>
      if (n > 0) {
        survivors.select("id", "text").write.mode("append")
          .parquet(s"$stateDir/docs")
        survivors.select("id", "text_md5").write.mode("append")
          .parquet(s"$stateDir/keys")
        survBands.foreach(_.write.mode("append").parquet(s"$stateDir/bands"))
        survivors.select("id", "toks").write.mode("append")
          .parquet(s"$stateDir/toks")
      })
  }

  /** The streaming front: each micro-batch runs [[curateBatch]].
    * `AvailableNow` drains what exists then stops (the restart-driven
    * shape the specs exercise); a long-lived deployment swaps in a
    * processing-time trigger, unchanged otherwise. */
  def curateStream(docs: DataFrame, stateDir: String,
                   checkpoint: String, cfg: Cfg = Cfg()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, stateDir, cfg); ()
      }

  /** Curate→serve composed stream (the reference's upload→index
    * lifecycle at stream granularity, with crawl-time dedup in front):
    * each micro-batch of serving-shaped docs (filename, text,
    * organization_id) is first curated against the cumulative curation
    * state — normalize → line-clean → exact + MinHash near-dedup vs
    * everything curated so far — and ONLY the survivors are indexed
    * into the serving store via
    * [[graft.serve.QueryService.ingestBatch]], becoming searchable at
    * the next batch boundary.
    *
    * Tenant isolation: curation runs in SCOPED mode with
    * `organization_id` as the scope — the exact key and every LSH band
    * key carry the tenant, so org_b streaming a document identical (or
    * near-dup) to one org_a already curated still survives and indexes
    * into org_b's tenant; only SAME-org duplicates drop (the
    * reference's tenant boundary, `tenant_schema.py:35-74`).
    *
    * State-identity boundary: scoped and unscoped dedup identities are
    * DIFFERENT key spaces (md5(org‖text) vs md5(text); prefixed vs
    * bare band keys) — a curation state written by the unscoped
    * [[curateStream]] cannot be resumed by this composed stream (or
    * vice versa): redelivered documents would match nothing and
    * re-enter. Curation state is derived data; when switching modes,
    * rebuild it by replaying the docs store through the new identity
    * rather than pointing the new stream at the old stateDir.
    *
    * Replay safety: the serving ingest runs BEFORE the curation-state
    * append ([[CurationOutcome]].commit). A micro-batch that fails or
    * crashes anywhere in between is replayed by the checkpoint against
    * the UN-mutated state — survivors re-derive identically — and
    * `ingestBatch` skips already-present content-derived ids, so
    * every retry outcome converges: documents are never exact-dropped
    * against their own half-committed batch (the pre-r10 defect) and
    * never double-indexed. Dedup identity is a deterministic hash of
    * (org, filename, text): a redelivered file exact-drops in the
    * curation state before it ever reaches the store. Per-batch cost
    * is O(batch + candidate pairs) on the curation side (the
    * [[curateBatch]] contract) plus O(delta) on the serving side (the
    * ingestBatch segment append) — nothing scales with either store. */
  def curateToServeStream(svc: graft.serve.QueryService, docs: DataFrame,
                          stateDir: String, checkpoint: String,
                          cfg: Cfg = Cfg()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val withId = batch.withColumn("id",
              xxhash64(col("organization_id"), col("filename"), col("text")))
            .dropDuplicates("id")
          val out = curateSurvivorsDeferred(
            withId.select(col("id"), col("text"),
              col("organization_id").as("scope")), stateDir, cfg)
          // survivors are batch-bounded → broadcast the id set back
          // onto the batch to recover filename/org for the store; the
          // outcome's materialized count gates the ingest (an isEmpty
          // probe here would be a redundant broadcast-build job)
          if (out.n > 0) {
            val keep = withId
              .join(broadcast(out.survivors.select(col("id"))),
                Seq("id"), "left_semi")
              .drop("id")
            svc.ingestBatch(keep); ()
          }
          out.commit()
          out.survivors.unpersist(false)
          ()
        }
      }

  /** JSONL (id, text) stream over a watched directory. */
  val docSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).json(dir)
}
