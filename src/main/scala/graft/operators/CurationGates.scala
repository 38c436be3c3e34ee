package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HashFunctions, TextFunctions}
import graft.streaming.CurationStream

/** DuckDB-oracle gates for the streaming curation subsystems that
  * rounds 8-10 pinned only in ScalaTest (VERDICT r10 asks #1/#2):
  *
  *  - q113 tenant-scoped streaming dedup identity: two micro-batches
  *    through [[CurationStream.curateSurvivorsDeferred]] in SCOPED
  *    mode — org_b's identical and near-dup copies of org_a's already-
  *    curated documents must SURVIVE (exact key = md5(scope∥text), LSH
  *    band keys scope-prefixed) while same-org copies drop (tenant
  *    isolation, the reference's core invariant,
  *    `tenant_schema.py:35-74`).
  *  - q114 compacted-state equivalence: [[CurationStream.compactState]]
  *    after the first batch and bucket pruning FORCED on
  *    (statePruneMinBytes = 0) — the pruned LSM read shape (tier
  *    partitions + un-absorbed delta files) must yield exactly the
  *    survivor set the plain sequential semantics produce. The oracle
  *    replays those semantics declaratively, so a pruned-away bucket,
  *    a double-counted delta row (skewed Jaccard sizes) or a lost key
  *    diverges the hash.
  *
  * Both gates read ONE shared state build (b1 → compact → b2 → b3,
  * [[builtState]]): q113 snapshots it below [[B3Base]] (= after b2),
  * q114 reads it whole — 3 batches + 1 compaction paid once instead
  * of the former two disjoint states' 5 + 1 (the r11 suite's two
  * heaviest entries, 20 s combined).
  *
  * The oracle twin replays the ENTIRE per-batch pipeline in DuckDB —
  * normalize → C4 line clean → within-batch exact keep-first →
  * cross-batch exact vs prior survivors → MinHash/LSH banding (scope-
  * prefixed when scoped) vs prior survivors' bands + the batch's own
  * self-join → exact-Jaccard verification at 0.8 → keep-first losers —
  * phase by phase, reusing the building blocks already gate-proven
  * pairwise (q99 normalize, q80 line clean, q37 wsTokens, q29/q30
  * minhash + banding + Jaccard).
  *
  * Near-dup fixtures append two tokens to a ~25-token document, so the
  * true Jaccard is ≈(k)/(k+2) ≥ 0.9 — well over the 0.8 threshold.
  * Whether LSH *catches* a given pair (4 bands × 4 rows) is
  * probabilistic per document but fully DETERMINISTIC given the
  * fixture, and both engines replay the same bands, so the gate hashes
  * identically while the CurateServeStreamSpec/StateCompactionSpec
  * specs continue to pin the semantic guarantees on crafted corpora.
  */
object CurationGates {

  /** Fixture cap: the gate's fixture is the FIRST [[FixtureCap]]
    * doc_ids at any scale factor — identical to the driver's full
    * sf0.01 table, constant-cost in the sf0.1 bench (the gate checks
    * SEMANTICS; the scale story is StreamBench's job). */
  val FixtureCap = 500L

  private def docs(spark: SparkSession, dir: String) =
    Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < FixtureCap)

  /** Fixture texts: one well-formed line (≥3 words, terminal '.') so
    * the C4 line rules keep it; the near-dup variant appends two
    * tokens (prefix-shingle containment ⇒ Jaccard ≈ k/(k+2)). */
  private val OrigTail = " closing marker sentence ends here."
  private val NearTail = " closing marker sentence ends here today anyway."

  private def orig: Column = concat(substring(col("text"), 1, 150), lit(OrigTail))
  private def near: Column = concat(substring(col("text"), 1, 150), lit(NearTail))

  /** Collect a fixture batch and rebuild it as a LOCAL frame: the
    * batches are gate-bounded (≤ ~300 rows) but their 5-way-union ×
    * string-expression lineage is a multi-MB analyzed plan, and the
    * curation core's ~40 jobs/batch each re-pay driver-side processing
    * of it (measured: localizing cut q113 28 → ~10 s with identical
    * output — the learnMerges lineage-cut lesson applied to gates). */
  private def localize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
  }

  private def origSql = s"substr(text, 1, 150) || '$OrigTail'"
  private def nearSql = s"substr(text, 1, 150) || '$NearTail'"

  // ---- shared fixture state: ONE build serves both gates ------------------

  /** Ids at or above this are batch-3 rows; q113's snapshot is the
    * store filtered BELOW it (the docs store is append-only, so the
    * post-b2 state is exactly the sub-[[B3Base]] id range). */
  private val B3Base = 60000000L

  // one build per documents dir (Verify and Bench each run q113 then
  // q114 in one session — the second gate reads the memoized store for
  // ~free; SPARK_GRAFT_ONLY=q114 alone still builds on demand)
  private val sharedState =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build the shared 3-batch scoped state ONCE per dir:
    * b1 → [[CurationStream.compactState]] (full 64-bucket tier even
    * for this small fixture — adaptive sizing would pick the floor —
    * so the forced-prune reads construct real partition filters over
    * the production fan-out) → b2 (reads the PRUNED TIER) → b3 (reads
    * tier ∪ b2's UN-ABSORBED delta files). The former layout ran five
    * batches + a compaction across two separate states (q113 6.25 s +
    * q114 13.75 s — the suite's two heaviest entries); this build is
    * three batches + one compaction paid once, covering the same
    * paths: scoped identity in b2, tier-exact / delta-band / fresh in
    * b3. */
  /** q113 (the suite-order first consumer) always REBUILDS and
    * republishes the memo — a min-of-n bench rep of q113 must pay the
    * real build, not a memo hit — while q114 reuses the latest build
    * (its honest cost IS the marginal read when it follows q113). */
  private def builtState(spark: SparkSession, dir: String,
                         rebuild: Boolean = false): String = {
    if (rebuild) {
      val s = buildState(spark, dir)
      sharedState.put(dir, s)
      s
    } else sharedState.computeIfAbsent(dir, _ => buildState(spark, dir))
  }

  private def buildState(spark: SparkSession, dir: String): String = {
      import spark.implicits._
      val d = docs(spark, dir)
      val cfg = CurationStream.Cfg(statePruneMinBytes = 0L)
      // b1: orgA curates every doc_id ≡ 0 (mod 5)
      val b1 = d.filter($"doc_id" % 5 === 0)
        .select($"doc_id".cast("long").as("id"), orig.as("text"),
          lit("orgA").as("scope"))
      // b2: cross-org exact/near copies (survive), same-org exact/near
      // copies (drop), fresh orgB originals — all against the tier
      val b2 = d.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 10000000L).as("id"), orig.as("text"),
          lit("orgB").as("scope"))
        .unionByName(d.filter($"doc_id" % 10 === 5)
          .select(($"doc_id" + 20000000L).as("id"), near.as("text"),
            lit("orgB").as("scope")))
        .unionByName(d.filter($"doc_id" % 15 === 0)
          .select(($"doc_id" + 30000000L).as("id"), orig.as("text"),
            lit("orgA").as("scope")))
        .unionByName(d.filter($"doc_id" % 15 === 5)
          .select(($"doc_id" + 40000000L).as("id"), near.as("text"),
            lit("orgA").as("scope")))
        .unionByName(d.filter($"doc_id" % 25 === 1)
          .select(($"doc_id" + 50000000L).as("id"), orig.as("text"),
            lit("orgB").as("scope")))
      // b3: same-org exact copies of b1 survivors (drop via the TIER
      // read), same-org near copies of b2 survivors (drop via the
      // un-absorbed DELTA bands), fresh orgA docs (survive)
      val b3 = d.filter($"doc_id" % 15 === 0)
        .select(($"doc_id" + B3Base).as("id"), orig.as("text"),
          lit("orgA").as("scope"))
        .unionByName(d.filter($"doc_id" % 10 === 0)
          .select(($"doc_id" + 70000000L).as("id"), near.as("text"),
            lit("orgB").as("scope")))
        .unionByName(d.filter($"doc_id" % 25 === 2)
          .select(($"doc_id" + 80000000L).as("id"), orig.as("text"),
            lit("orgA").as("scope")))
      val state = TmpDirs.create("graft_q113_q114_state")
      CurationStream.curateBatch(localize(b1), state, cfg)
      CurationStream.compactState(spark, state,
        targetBuckets = Some(CurationStream.StateBuckets))
      CurationStream.curateBatch(localize(b2), state, cfg)
      CurationStream.curateBatch(localize(b3), state, cfg)
      state
  }

  // ---- q113: tenant-scoped streaming dedup identity ----------------------

  /** Output = the docs store after b1+b2 (the sub-[[B3Base]] snapshot
    * of the shared state): org_b's identical and near-dup copies of
    * org_a's already-curated documents survive, same-org copies drop.
    * The compaction between b1 and b2 must be invisible here — its
    * equivalence is exactly q114's guarantee. */
  def scopedDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"${builtState(spark, dir, rebuild = true)}/docs")
      .filter($"id" < B3Base)
      .select($"id", md5($"text").as("text_md5"))
      .orderBy($"id")
  }

  private val scopedBatches = Seq(
    s"""b1 AS (
       |  SELECT CAST(doc_id AS BIGINT) AS id, 'orgA' AS scope, $origSql AS raw
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 5 = 0)""".stripMargin,
    s"""b2 AS (
       |  SELECT CAST(doc_id + 10000000 AS BIGINT) AS id, 'orgB' AS scope, $origSql AS raw
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 10 = 0
       |  UNION ALL
       |  SELECT CAST(doc_id + 20000000 AS BIGINT), 'orgB', $nearSql
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 10 = 5
       |  UNION ALL
       |  SELECT CAST(doc_id + 30000000 AS BIGINT), 'orgA', $origSql
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 15 = 0
       |  UNION ALL
       |  SELECT CAST(doc_id + 40000000 AS BIGINT), 'orgA', $nearSql
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 15 = 5
       |  UNION ALL
       |  SELECT CAST(doc_id + 50000000 AS BIGINT), 'orgB', $origSql
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 25 = 1)""".stripMargin)

  // ---- q114: compacted-state (LSM tier) equivalence -----------------------

  /** Output = the FULL docs store of the shared state: b2 read the
    * forced-prune 64-bucket tier, b3 read tier ∪ b2's un-absorbed
    * delta files, and the oracle replays the plain sequential
    * semantics — a pruned-away bucket, a double-counted delta row
    * (skewed Jaccard sizes) or a lost key diverges the hash. */
  def compactedState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"${builtState(spark, dir)}/docs")
      .select($"id", md5($"text").as("text_md5"))
      .orderBy($"id")
  }

  private val b3Cte =
    s"""b3 AS (
       |  SELECT CAST(doc_id + $B3Base AS BIGINT) AS id, 'orgA' AS scope, $origSql AS raw
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 15 = 0
       |  UNION ALL
       |  SELECT CAST(doc_id + 70000000 AS BIGINT), 'orgB', $nearSql
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 10 = 0
       |  UNION ALL
       |  SELECT CAST(doc_id + 80000000 AS BIGINT), 'orgA', $origSql
       |  FROM documents WHERE doc_id < $FixtureCap AND doc_id % 25 = 2)""".stripMargin

  // ---- the sequential-curation replay generator ---------------------------

  /** The C4 keep rule in DuckDB (the q80-proven translation of
    * [[Clean.keepLine]] at minWords = 3). */
  private val keepLineSql =
    "len(regexp_split_to_array(trim(l), '\\s+')) >= 3" +
      " AND regexp_matches(trim(l), '[.!?]\"?$')" +
      " AND NOT contains(lower(l), 'lorem ipsum')" +
      " AND NOT contains(lower(l), 'javascript')" +
      " AND NOT contains(l, '{')"

  /** Emit the full WITH-clause replay of `n` sequential curation
    * batches over CTEs `b1..bn` (columns id, raw — plus scope when
    * `scoped`), ending in the survivors' (id, md5(cleaned)) union.
    * Mirrors [[CurationStream.curateSurvivorsDeferred]] stage by
    * stage; see the object doc for the mapping. */
  private def replaySql(batches: Seq[String], scoped: Boolean): String = {
    val n = batches.size
    val sc = if (scoped) ", scope" else ""
    val keyExpr =
      if (scoped) "md5(scope || chr(0) || cleaned)" else "md5(cleaned)"
    val bandKeyExpr =
      "md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '_'))"
    val hsExpr =
      s"list_transform(${TextFunctions.shinglesSql("toks", 3)}, s -> ${TextFunctions.hashModSql("s")})"
    val phases = (1 to n).map { p =>
      val seenKeys =
        if (p == 1) ""
        else (1 until p).map(q => s"SELECT key FROM sv$q").mkString(
          "\n  WHERE key NOT IN (", " UNION ALL ", ")")
      val corpusBands =
        if (p == 1) ""
        else s""",
          |cb$p AS (${(1 until p).map(q =>
            s"SELECT d.id, d.band, d.band_key FROM bp$q d JOIN sv$q s ON s.id = d.id")
            .mkString(" UNION ALL ")})""".stripMargin
      val candVsCorpus =
        if (p == 1) ""
        else s"""SELECT a.id AS id_a, b.id AS id_b FROM bp$p a JOIN cb$p b
          |    ON a.band = b.band AND a.band_key = b.band_key AND a.id <> b.id
          |  UNION ALL
          |  """.stripMargin
      val sizes = (1 to p).map(q => s"SELECT * FROM sz$q").mkString(" UNION ALL ")
      val shUnion = (1 to p).map(q => s"SELECT * FROM sh$q").mkString(" UNION ALL ")
      s"""cl$p AS (
         |  SELECT id$sc,
         |    list_filter(string_split(${TextFunctions.normalizeTextSql("raw")}, chr(10)),
         |      l -> $keepLineSql) AS kept
         |  FROM b$p),
         |kk$p AS (
         |  SELECT id$sc, cleaned, $keyExpr AS key,
         |    ${TextFunctions.wsTokensSql("lower(cleaned)")} AS toks
         |  FROM (SELECT id$sc, list_aggregate(kept, 'string_agg', chr(10)) AS cleaned
         |        FROM cl$p WHERE len(kept) > 0) c0),
         |e$p AS (
         |  SELECT t.* FROM kk$p t
         |  JOIN (SELECT key, MIN(id) AS id FROM kk$p GROUP BY key) m
         |    ON m.key = t.key AND m.id = t.id),
         |f$p AS (
         |  SELECT * FROM e$p$seenKeys),
         |sh$p AS (
         |  SELECT id, unnest(list_distinct(${TextFunctions.shinglesSql("toks", 3)})) AS sh
         |  FROM f$p),
         |sz$p AS (SELECT id, COUNT(*) AS n_sh FROM sh$p GROUP BY id),
         |sg$p AS (
         |  SELECT id$sc, ${HashFunctions.minhashSigSql("hs", 16)} AS sig
         |  FROM (SELECT id$sc, $hsExpr AS hs FROM f$p) h WHERE len(hs) > 0),
         |bd$p AS (
         |  SELECT id$sc, unnest(list_transform(range(4), b ->
         |    {'band': b, 'band_key': $bandKeyExpr}), recursive := true)
         |  FROM sg$p),
         |bp$p AS (
         |  SELECT id, band,
         |    ${if (scoped) "scope || '|' || band_key" else "band_key"} AS band_key
         |  FROM bd$p)$corpusBands,
         |cd$p AS (
         |  SELECT DISTINCT id_a, id_b FROM (
         |  ${candVsCorpus}SELECT a.id AS id_a, b.id AS id_b FROM bp$p a JOIN bp$p b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id) u),
         |jc$p AS (
         |  SELECT i.id_a, i.id_b FROM
         |    (SELECT c.id_a, c.id_b, COUNT(*) AS ni FROM cd$p c
         |      JOIN ($shUnion) sa ON sa.id = c.id_a
         |      JOIN ($shUnion) sb ON sb.id = c.id_b AND sb.sh = sa.sh
         |      GROUP BY c.id_a, c.id_b) i
         |    JOIN ($sizes) za ON za.id = i.id_a
         |    JOIN ($sizes) zb ON zb.id = i.id_b
         |  WHERE CAST(i.ni AS DOUBLE) / (za.n_sh + zb.n_sh - i.ni) >= 0.8),
         |ls$p AS (
         |  SELECT DISTINCT CASE WHEN j.id_b IN (SELECT id FROM f$p)
         |    THEN j.id_b ELSE j.id_a END AS id FROM jc$p j),
         |sv$p AS (
         |  SELECT * FROM f$p WHERE id NOT IN (SELECT id FROM ls$p))""".stripMargin
    }
    val finalUnion = (1 to n).map(p => s"SELECT id, cleaned FROM sv$p")
      .mkString(" UNION ALL ")
    s"""WITH ${(batches ++ phases).mkString(",\n")}
       |SELECT id, md5(cleaned) AS text_md5 FROM ($finalUnion) s
       |ORDER BY id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_scoped_dedup" -> (scopedDedup _),
    "q114_compacted_state" -> (compactedState _))

  val oracle: Map[String, String] = Map(
    "q113_scoped_dedup" -> replaySql(scopedBatches, scoped = true),
    "q114_compacted_state" -> replaySql(scopedBatches :+ b3Cte, scoped = true))
}
