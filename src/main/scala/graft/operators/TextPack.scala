package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{HashFunctions, TextFunctions}

/** Training-data pipeline query pack: dedup family (exact / MinHash+LSH
  * / SimHash+Hamming / n-gram Jaccard / embedding-cosine), text
  * analysis (language-ID, quality, token counts, fingerprint),
  * chunking, graph BFS, tenant scoping, multimodal metadata — each
  * with a DuckDB oracle twin.
  *
  * Near-dup checks need near-dups to find: the corpus is augmented
  * with deterministic perturbed copies (doc_id+1,000,000 with the last
  * two tokens dropped for doc_id % 7 == 0) and exact copies
  * (doc_id+2,000,000 for doc_id % 13 == 0), constructed identically in
  * Spark and SQL, so every dedup technique demonstrably fires at any
  * scale factor.
  */
object TextPack {

  val PerturbOffset = 1000000L
  val CopyOffset = 2000000L
  val MinhashK = 16
  val Bands = 4
  val Rows = 4

  private def docs(spark: SparkSession, dir: String) = Tables(spark, dir, "documents")
  private def emb(spark: SparkSession, dir: String) = Tables(spark, dir, "embeddings")

  /** Tokenized corpus ∪ perturbed near-copies: (doc_id, source, toks). */
  private def dedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select($"doc_id", $"source",
      TextFunctions.tokenize($"text").as("toks"))
    // greatest(…, 0): total-safe even if the optimizer evaluates the
    // projection before the size filter (observed under ANSI mode when
    // this subtree feeds a self-join)
    val pert = base.filter($"doc_id" % 7 === 0 && size($"toks") >= 5)
      .select(($"doc_id" + PerturbOffset).as("doc_id"), $"source",
        slice($"toks", lit(1), greatest(size($"toks") - 2, lit(0))).as("toks"))
    base.unionByName(pert)
  }

  // ---- queries -----------------------------------------------------------

  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).select($"doc_id", $"text")
    val copies = d.filter($"doc_id" % 13 === 0)
      .select(($"doc_id" + CopyOffset).as("doc_id"), $"text")
    Dedup.exactGroups(d.union(copies), "doc_id", "text").orderBy($"text_md5")
  }

  def minhashSig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.minhashSignatures(dedupCorpus(spark, dir), "doc_id", "toks", MinhashK)
      .select($"id".as("doc_id"), array_join($"sig", "_").as("sig"))
      .orderBy($"doc_id")
  }

  def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dc = dedupCorpus(spark, dir)
    val sigs = Dedup.minhashSignatures(dc, "doc_id", "toks", MinhashK)
    val cands = Dedup.lshCandidates(sigs, Bands, Rows)
    Dedup.jaccardVerify(cands, dc, "doc_id", "toks")
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .filter($"jaccard" >= 0.4)
      .orderBy($"id_a", $"id_b")
  }

  /** Dedup cluster formation (q56): connected components over the
    * LSH-verified near-dup pairs (q30's graph), with the min-id
    * canonical representative and cluster size — the "keep one per
    * cluster" view a training-data pipeline materializes. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dc = dedupCorpus(spark, dir)
    val sigs = Dedup.minhashSignatures(dc, "doc_id", "toks", MinhashK)
    val cands = Dedup.lshCandidates(sigs, Bands, Rows)
    val pairs = Dedup.jaccardVerify(cands, dc, "doc_id", "toks")
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .filter($"jaccard" >= 0.4)
    val cl = Dedup.clusters(pairs)
    val sizes = cl.groupBy($"cluster").agg(count(lit(1)).as("n_members"))
    cl.join(sizes, "cluster")
      .select($"id".as("doc_id"), $"cluster".as("cluster_id"), $"n_members")
      .orderBy($"doc_id")
  }

  def simhashTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.simhashTable(dedupCorpus(spark, dir), "doc_id", "toks")
      .select($"id".as("doc_id"), $"simhash")
      .orderBy($"doc_id")
  }

  def hammingPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 56-bit fingerprint: 8-bit pigeonhole blocks (vs 4-5 bits at 32)
    // keep candidate fan-out ~16x lower, and chance collisions within
    // Hamming 6 are ~0 instead of 0.03% of all pairs
    Dedup.hammingPairs(
        Dedup.simhashTable(dedupCorpus(spark, dir), "doc_id", "toks", bits = 56),
        6, bits = 56)
      .select($"id_a", $"id_b", $"hamming".cast("long").as("hamming"))
      .orderBy($"id_a", $"id_b")
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.jaccardBlocked(dedupCorpus(spark, dir), "doc_id", "toks", "source", 0.4)
      .orderBy($"id_a", $"id_b")
  }

  def cosineDups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding")
    val copies = e.filter($"vec_id" % 11 === 0)
      .select(($"vec_id" + PerturbOffset).as("vec_id"), $"embedding")
    // LSH-bucketed blocking (data-independent), not the semantic label
    // column — the block key that survives 100 TB
    Dedup.cosinePairsLsh(e.unionByName(copies), "vec_id", "embedding", 0.95)
      .orderBy($"id_a", $"id_b")
  }

  /** q96: SemDeDup over the embeddings table ∪ exact copies (vec_id %
    * 11, +[[PerturbOffset]]) — the copies are guaranteed ε-groups, so
    * the keep-first removal demonstrably fires; cluster count 8 keeps
    * the within-cluster pair joins gate-sized. */
  def semDedupGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select($"vec_id", $"embedding")
    val copies = e.filter($"vec_id" % 11 === 0)
      .select(($"vec_id" + PerturbOffset).as("vec_id"), $"embedding")
    Dedup.semDedup(e.unionByName(copies), "vec_id", "embedding",
        k = 8, eps = 0.95)
      .select($"id".as("vec_id"), $"cluster_id", $"keep")
      .orderBy($"vec_id")
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id",
        TextAnalysis.langId(TextFunctions.wsTokens(lower($"text"))).as("lang_detected"))
      .orderBy($"doc_id")
  }

  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = TextAnalysis.qualityColumns($"text").map { case (n, c) => c.as(n) }
    docs(spark, dir).select(($"doc_id" +: cols): _*).orderBy($"doc_id")
  }

  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir).select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        size(TextFunctions.wsTokens($"text")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(lower($"text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_tokens"))
      .orderBy($"doc_id")
  }

  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id",
        TextAnalysis.fingerprint(TextFunctions.wsTokens(lower($"text"))).as("fp"))
      .orderBy($"doc_id")
  }

  def chunker(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select($"doc_id",
      TextFunctions.wsTokens($"text").as("toks"))
    Chunker.tokenWindows(base, "doc_id", "toks", 32, 8)
      .orderBy($"doc_id", $"chunk_index")
  }

  def graph2Hop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    val edges = GraphOps.consecutiveEdges(d)
    val seeds = d.filter($"doc_id" % 97 === 0).select($"doc_id".as("node"))
    GraphOps.bfs(edges, seeds, 2).orderBy($"node")
  }

  /** J7 (q51): relation-chain reconstruction over a branching DAG —
    * +1 step edges everywhere, +3 skip edges from doc_ids divisible by
    * 5. The unique shortest 0→9 chain is [0,3,4,5,8,9] (5 hops, the
    * maxDepth boundary); the oracle recovers it with a recursive CTE. */
  def graphChain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).select($"doc_id")
    val step = d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    val skip = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 3 && col("a.doc_id") % 5 === 0)
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    GraphOps.chain(step.unionByName(skip), 0L, 9L, maxDepth = 5)
      .orderBy($"step")
  }

  def tenantScope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .filter($"source" === "src3" && $"lang".isin("en", "fr"))
      .select($"doc_id", $"source".as("organization_id"), $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir).select(
        $"doc_id",
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        md5($"text").as("digest"),
        when($"n_chars" % 3 === 0, "image/jpeg")
          .when($"n_chars" % 3 === 1, "image/png")
          .otherwise("audio/wav").as("media_type"),
        (TextFunctions.hash56(md5($"text")) % 65536L).as("feature_bucket"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_exact_dedup" -> (exactDedup _),
    "q29_minhash_sig" -> (minhashSig _),
    "q30_lsh_pairs" -> (lshPairs _),
    "q31_simhash" -> (simhashTable _),
    "q32_hamming_pairs" -> (hammingPairs _),
    "q33_ngram_jaccard" -> (ngramJaccard _),
    "q34_cosine_dups" -> (cosineDups _),
    "q35_langid" -> (langId _),
    "q36_quality" -> (quality _),
    "q37_token_stats" -> (tokenStats _),
    "q38_fingerprint" -> (fingerprint _),
    "q39_chunker" -> (chunker _),
    "q40_graph_2hop" -> (graph2Hop _),
    "q41_tenant_scope" -> (tenantScope _),
    "q42_multimodal_meta" -> (multimodalMeta _),
    "q51_graph_chain" -> (graphChain _),
    "q56_dedup_clusters" -> (dedupClusters _),
    "q96_semdedup" -> (semDedupGate _),
  )

  // ---- oracle SQL --------------------------------------------------------

  private val toksSql = TextFunctions.tokenizeSql("text")
  private val wsLowerSql = TextFunctions.wsTokensSql("lower(text)")
  private val wsSql = TextFunctions.wsTokensSql("text")

  /** Shared CTE: tokenized corpus ∪ perturbed near-copies. */
  private val dcCte =
    s"""dc AS (
       |  SELECT doc_id, source, toks FROM (SELECT doc_id, source, $toksSql AS toks FROM documents) b0
       |  UNION ALL
       |  SELECT doc_id + $PerturbOffset, source, list_slice(toks, 1, greatest(len(toks) - 2, 0))
       |  FROM (SELECT doc_id, source, $toksSql AS toks FROM documents) b1
       |  WHERE doc_id % 7 = 0 AND len(toks) >= 5)""".stripMargin

  private val shingleHashesSql =
    s"list_transform(${TextFunctions.shinglesSql("toks", 3)}, s -> ${TextFunctions.hashModSql("s")})"

  private val sigCte =
    s"""sh AS (SELECT doc_id, $shingleHashesSql AS hs FROM dc),
       |sig AS (SELECT doc_id, ${HashFunctions.minhashSigSql("hs", MinhashK)} AS sig FROM sh WHERE len(hs) > 0)""".stripMargin

  /** Jaccard-verification CTE over candidate pairs in `cand(id_a,id_b)`. */
  private val jaccardCtes =
    s"""shd AS (SELECT doc_id, unnest(list_distinct(${TextFunctions.shinglesSql("toks", 3)})) AS sh FROM dc),
       |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
       |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |  FROM cand c JOIN shd sa ON sa.doc_id = c.id_a
       |  JOIN shd sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
       |  GROUP BY c.id_a, c.id_b),
       |jac AS (SELECT id_a, id_b, CAST(n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - n_inter) AS jaccard
       |  FROM inter JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b)""".stripMargin

  private val simhashExpr = HashFunctions.simhashSql("hs")

  val oracle: Map[String, String] = Map(
    "q28_exact_dedup" ->
      s"""WITH c AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $CopyOffset, text FROM documents WHERE doc_id % 13 = 0)
         |SELECT md5(text) AS text_md5, COUNT(*) AS n_dups,
         |  MIN(doc_id) AS canonical_id, MAX(doc_id) AS max_id
         |FROM c GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY text_md5""".stripMargin,
    "q29_minhash_sig" ->
      s"""WITH $dcCte,
         |$sigCte
         |SELECT doc_id, array_to_string(sig, '_') AS sig FROM sig ORDER BY doc_id""".stripMargin,
    "q30_lsh_pairs" ->
      s"""WITH $dcCte,
         |$sigCte,
         |banded AS (SELECT doc_id, unnest(list_transform(range($Bands), b ->
         |  {'band': b, 'band_key': md5(array_to_string(list_slice(sig, b*$Rows + 1, b*$Rows + $Rows), '_'))}), recursive := true) FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |$jaccardCtes
         |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
         |WHERE round(jaccard, 6) >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "q31_simhash" ->
      s"""WITH $dcCte,
         |sh AS (SELECT doc_id, list_transform(toks, t -> ${TextFunctions.hashModSql("t")}) AS hs FROM dc)
         |SELECT doc_id, $simhashExpr AS simhash FROM sh ORDER BY doc_id""".stripMargin,
    "q32_hamming_pairs" -> {
      // same pigeonhole layout as Dedup.hammingPairs (7 8-bit blocks
      // over the 56-bit fingerprint for maxDist=6): agree-on-one-block
      // candidates, exact verify
      val blockStructs = Dedup.pigeonholeBlocks(56, 6).zipWithIndex
        .map { case ((off, w), i) =>
          s"{'blk': $i, 'v': (simhash >> $off) & ${(1L << w) - 1}}"
        }.mkString(", ")
      s"""WITH $dcCte,
         |sh AS (SELECT doc_id, list_transform(toks, t -> ${TextFunctions.hash56Sql("t")}) AS hs FROM dc),
         |sim AS (SELECT doc_id, ${HashFunctions.simhashSql("hs", 56)} AS simhash FROM sh),
         |bk AS (SELECT doc_id, simhash, unnest([$blockStructs], recursive := true) FROM sim),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |  FROM bk a JOIN bk b ON a.blk = b.blk AND a.v = b.v AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin
    },
    "q33_ngram_jaccard" ->
      s"""WITH $dcCte,
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM dc a JOIN dc b ON a.source = b.source AND a.doc_id < b.doc_id),
         |$jaccardCtes
         |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
         |WHERE round(jaccard, 6) >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    // SemDeDup replay: hash-sampled centroids, argmax-cosine assignment
    // (ties to min cid), remove-iff-smaller-id-ε-neighbor — every step
    // the deterministic construction semDedup documents
    "q96_semdedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + $PerturbOffset, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 11 = 0),
         |cents AS (SELECT row_number() OVER (ORDER BY h, sid) AS cid, cvec FROM (
         |  SELECT vec_id AS sid, emb AS cvec, md5(CAST(vec_id AS VARCHAR)) AS h
         |  FROM e ORDER BY h, sid LIMIT 8)),
         |scored AS (SELECT e.vec_id, c.cid, round(list_cosine_similarity(e.emb, c.cvec), 6) AS s
         |  FROM e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn FROM scored) t
         |  WHERE rn = 1),
         |av AS (SELECT a.vec_id, a.cluster_id, e.emb FROM asg a JOIN e ON e.vec_id = a.vec_id),
         |rm AS (SELECT DISTINCT b.vec_id FROM av a JOIN av b
         |  ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.95)
         |SELECT av.vec_id, av.cluster_id, (rm.vec_id IS NULL) AS keep
         |FROM av LEFT JOIN rm ON rm.vec_id = av.vec_id
         |ORDER BY av.vec_id""".stripMargin,
    "q34_cosine_dups" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + $PerturbOffset, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 11 = 0),
         |sig AS (SELECT vec_id, emb, t.tbl,
         |  ${graft.functions.VectorFunctions.hyperplaneBucketSql("emb", "t.tbl", 64, 6)} AS bucket
         |  FROM e, range(4) t(tbl)),
         |p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_cosine_similarity(a.emb, b.emb), 6) AS score
         |  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, score FROM p WHERE score >= 0.95 ORDER BY id_a, id_b""".stripMargin,
    "q35_langid" ->
      s"""SELECT doc_id, ${TextAnalysis.langIdSql(wsLowerSql)} AS lang_detected
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_quality" -> {
      val cols = TextAnalysis.qualitySql("text")
        .map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
      s"SELECT doc_id,\n  $cols\nFROM documents ORDER BY doc_id"
    },
    "q37_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($wsSql) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q38_fingerprint" ->
      s"""SELECT doc_id, ${TextAnalysis.fingerprintSql(wsLowerSql)} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q39_chunker" ->
      (Chunker.tokenWindowsSql(wsSql, 32, 8) + "\nORDER BY doc_id, chunk_index"),
    "q40_graph_2hop" ->
      s"""WITH e AS (SELECT src, dst FROM (
         |  SELECT doc_id AS src, lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS dst FROM documents) t
         |  WHERE dst IS NOT NULL),
         |s AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist FROM documents WHERE doc_id % 97 = 0),
         |h1 AS (SELECT e.dst AS node, CAST(1 AS BIGINT) AS dist FROM s JOIN e ON s.node = e.src),
         |h2 AS (SELECT e.dst AS node, CAST(2 AS BIGINT) AS dist FROM h1 JOIN e ON h1.node = e.src),
         |u AS (SELECT * FROM s UNION ALL SELECT * FROM h1 UNION ALL SELECT * FROM h2)
         |SELECT node, MIN(dist) AS dist FROM u GROUP BY node ORDER BY node""".stripMargin,
    "q41_tenant_scope" ->
      """SELECT doc_id, source AS organization_id, lang, n_chars
        |FROM documents WHERE source = 'src3' AND lang IN ('en', 'fr')
        |ORDER BY doc_id""".stripMargin,
    "q42_multimodal_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS digest,
         |  CASE WHEN n_chars % 3 = 0 THEN 'image/jpeg'
         |       WHEN n_chars % 3 = 1 THEN 'image/png'
         |       ELSE 'audio/wav' END AS media_type,
         |  (${TextFunctions.hash56Sql("md5(text)")} % 65536) AS feature_bucket
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q51_graph_chain" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  UNION ALL
        |  SELECT a.doc_id, b.doc_id FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 3 AND a.doc_id % 5 = 0),
        |paths(node, path) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, [CAST(0 AS BIGINT)] AS path
        |  UNION ALL
        |  SELECT e.dst, list_append(p.path, e.dst) FROM paths p JOIN e ON p.node = e.src
        |  WHERE NOT list_contains(p.path, e.dst) AND len(p.path) <= 5 AND p.node <> 9),
        |best AS (SELECT path FROM paths WHERE node = 9 ORDER BY len(path), path LIMIT 1)
        |SELECT u.step, u.node FROM (
        |  SELECT unnest(list_transform(path, (n, i) -> {'step': CAST(i - 1 AS BIGINT), 'node': n}), recursive := true) FROM best) u
        |ORDER BY step""".stripMargin,
    // q30's near-dup pair graph → connected components (min reachable
    // id per node) via a recursive CTE, then cluster sizes.
    // `ed` is MATERIALIZED: DuckDB inlines single-chain CTEs into the
    // recursive term, so every closure iteration re-ran the ENTIRE
    // minhash→LSH→Jaccard pipeline upstream of the edge list — at
    // sf0.1 that is 193 s vs 46 s materialized (≈ the iteration
    // count), and at sf1 each re-run is ~20 min, which turned the
    // r15 full sf1 replay into a multi-hour hang on this one gate.
    // Result rows are identical either way (verified at sf0.1).
    "q56_dedup_clusters" ->
      s"""WITH RECURSIVE $dcCte,
         |$sigCte,
         |banded AS (SELECT doc_id, unnest(list_transform(range($Bands), b ->
         |  {'band': b, 'band_key': md5(array_to_string(list_slice(sig, b*$Rows + 1, b*$Rows + $Rows), '_'))}), recursive := true) FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |$jaccardCtes,
         |jp AS (SELECT id_a, id_b FROM jac WHERE round(jaccard, 6) >= 0.4),
         |ed AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM jp UNION SELECT id_b, id_a FROM jp),
         |nodes AS (SELECT DISTINCT src AS id FROM ed),
         |reach(id, root) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.root FROM reach r JOIN ed e ON e.src = r.id),
         |cl AS (SELECT id, MIN(root) AS cluster_id FROM reach GROUP BY id),
         |csz AS (SELECT cluster_id, COUNT(*) AS n_members FROM cl GROUP BY cluster_id)
         |SELECT c.id AS doc_id, c.cluster_id, s.n_members
         |FROM cl c JOIN csz s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
  )
}
