package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{EmbedFunctions, TextFunctions}
import graft.ingest.{Pipeline, QualityAnalyzer}
import graft.retrieval.HybridSearch

/** DuckDB-oracle gates for the storage / join / filter operators that
  * round 2 verified only in ScalaTest (VERDICT r2 coverage debt):
  *
  *  - q73 doc-id generation + upsert (I14+S6, `document_processor
  *    .py:183-188`, `metadata_store.py:808-847`)
  *  - q74 cascade delete with partition-scoped index recompute
  *    (U6+I13, `master_pipeline.py:847-890`)
  *  - q75 related-document lookup (J6, `document_graph.py:236-262`)
  *  - q76 first-writer-wins merge + result-detail join (J8+J2,
  *    `enhanced_hybrid_search.py:318-335`, `hybrid_search.py:457-470`)
  *  - q77 visual-element search (S3+V13, `hybrid_search.py:640-700`)
  *  - q78 quality routing over pinned fixtures (I2+A8,
  *    `document_quality.py:544-581`)
  *  - q79 filter compiler + map containment + payload projection +
  *    positive-score filter (F2+F5+F6+F8, `vector_store.py:275-305`)
  *
  * Same stance as [[IngestGates]]: the Spark side runs the REAL library
  * code path; the oracle derives the expected rows declaratively in
  * DuckDB from the same parquet inputs (q78 uses q71-style pinned
  * literals, grounded by AcronymQualitySpec).
  */
object StoreGates {

  private def docs(spark: SparkSession, dir: String) = Tables(spark, dir, "documents")
  private def emb(spark: SparkSession, dir: String) = Tables(spark, dir, "embeddings")

  // ---- q73: doc-id generation + delete-then-insert upsert ---------------

  /** Every doc gets its I14 id (`{filename}_{md5[:12]}` over
    * `doc{doc_id}.md`); the existing chunk table splits each doc into
    * two half-text chunks; docs ≡ 0 (mod 5) are then re-uploaded as a
    * single full-text chunk. Upsert must drop BOTH old halves for
    * re-uploaded docs and keep both for the rest. */
  def docUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, Pipeline.documentId(s"doc$id.md", text), text)
      }
      .toDF("doc_id", "document_id", "text")
    val existing = base.select($"doc_id", $"document_id",
        concat($"document_id", lit("_c0")).as("id"),
        expr("substring(text, 1, CAST(length(text) / 2 AS INT))").as("ctext"))
      .unionByName(base.select($"doc_id", $"document_id",
        concat($"document_id", lit("_c1")).as("id"),
        expr("substring(text, CAST(length(text) / 2 AS INT) + 1)").as("ctext")))
    val incoming = base.filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"document_id",
        concat($"document_id", lit("_full")).as("id"), $"text".as("ctext"))
    Pipeline.upsertChunks(existing, incoming)
      .select($"doc_id", $"document_id", $"id", md5($"ctext").as("chunk_md5"))
      .orderBy($"doc_id", $"id")
  }

  private val docUpsertOracle: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    'doc' || doc_id || '.md_' || substr(md5(text), 1, 12) AS document_id,
      |    text FROM documents),
      |kept AS (
      |  SELECT doc_id, document_id, document_id || '_c0' AS id,
      |    md5(substr(text, 1, CAST(trunc(length(text) / 2) AS INT))) AS chunk_md5
      |  FROM base WHERE doc_id % 5 != 0
      |  UNION ALL
      |  SELECT doc_id, document_id, document_id || '_c1',
      |    md5(substr(text, CAST(trunc(length(text) / 2) AS INT) + 1))
      |  FROM base WHERE doc_id % 5 != 0
      |  UNION ALL
      |  SELECT doc_id, document_id, document_id || '_full', md5(text)
      |  FROM base WHERE doc_id % 5 = 0)
      |SELECT doc_id, document_id, id, chunk_md5 FROM kept
      |ORDER BY doc_id, id""".stripMargin

  // ---- q74: cascade delete + partition-scoped index recompute -----------

  /** One chunk per doc feeds a real BM25 IndexBundle; docs ≡ 0 (mod 10)
    * are cascade-deleted; the output is the SURVIVING index state —
    * per-term df joined with the recomputed corpus stats — so the gate
    * pins both the row removal and the df/n_docs/avgdl recompute. */
  def cascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunks = docs(spark, dir).select(
      concat(lit("c"), $"doc_id").as("id"),
      concat(lit("d"), $"doc_id").as("document_id"),
      $"text")
    val corpus = BM25.corpus(chunks, "id", "text")
    val postings = BM25.postings(corpus)
    val docFreq = BM25.docFreq(postings)
    val stats = BM25.stats(corpus)
    val bundle = Pipeline.IndexBundle(chunks, postings, docFreq,
      BM25.idfTable(docFreq, stats), stats)
    val victims = docs(spark, dir).filter($"doc_id" % 10 === 0)
      .select(concat(lit("d"), $"doc_id")).as[String].collect().toSeq
    val after = Pipeline.cascadeDelete(bundle, victims)
    after.docFreq.crossJoin(
        after.stats.select($"n_docs", round($"avgdl", 6).as("avgdl")))
      .select($"term", $"df", $"n_docs", $"avgdl")
      .orderBy($"term")
  }

  private val cascadeOracle: String = {
    val toks = TextFunctions.tokenizeSql("text")
    s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id % 10 != 0),
       |base AS (SELECT doc_id, toks, len(toks) AS dl FROM tok WHERE len(toks) > 0),
       |posting AS (SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base) u
       |  GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |    round(CAST(SUM(dl) AS DOUBLE) / COUNT(*), 6) AS avgdl
       |  FROM (SELECT DISTINCT doc_id, dl FROM posting) d)
       |SELECT term, df, n_docs, avgdl FROM dfreq, stats
       |ORDER BY term""".stripMargin
  }

  // ---- q75: related-document lookup over FK edges -----------------------

  /** The real J6 driver API (undirected distinct neighbors) unioned
    * over five seed nodes, on the orders FK graph (src = o_custkey,
    * dst = o_orderkey + 100000 so node ids never collide). */
  def relatedLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = Tables(spark, dir, "orders").select(
      $"o_custkey".cast("long").as("src"),
      ($"o_orderkey" + 100000L).cast("long").as("dst"))
    val seeds = Seq(1L, 2L, 3L, 4L, 5L)
    seeds.map { s =>
        GraphOps.related(edges, s).withColumn("seed", lit(s))
      }
      .reduce(_ unionByName _)
      .select($"seed", $"node")
      .orderBy($"seed", $"node")
  }

  private val relatedOracle: String =
    """WITH seeds(seed) AS (VALUES (1), (2), (3), (4), (5)),
      |edges AS (SELECT CAST(o_custkey AS BIGINT) AS src,
      |    CAST(o_orderkey + 100000 AS BIGINT) AS dst FROM orders),
      |nbr AS (
      |  SELECT s.seed, e.dst AS node FROM seeds s JOIN edges e ON e.src = s.seed
      |  UNION
      |  SELECT s.seed, e.src FROM seeds s JOIN edges e ON e.dst = s.seed)
      |SELECT CAST(seed AS BIGINT) AS seed, node FROM nbr
      |ORDER BY seed, node""".stripMargin

  // ---- q76: first-writer-wins merge + result-detail join ----------------

  /** Priority list = BM25 top-10, base list = dense top-10 (over the
    * shared doc_id ≡ vec_id key space); the real J8 merge keeps the
    * priority row on conflicts, then the J2 detail join decorates the
    * merged ids with document payload. */
  def mergeDetail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prio = BM25.search(docs(spark, dir), "doc_id", "text",
        RetrievalPack.QueryTokens, 10, positiveOnly = false)
      .select($"id", round($"score", 4).as("rrf_score"))
    val e = emb(spark, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding")
    val base = DenseKnn.topK(e, "vec_id", "embedding", q, "embedding", 10)
      .select($"id", round($"score", 6).as("rrf_score"))
    val merged = HybridSearch.mergeFirstWriterWins(prio, base)
    merged.join(docs(spark, dir).select($"doc_id".as("id"),
        md5($"text").as("text_md5"), $"lang"), Seq("id"))
      .select($"id".as("doc_id"), $"rrf_score", $"text_md5", $"lang")
      .orderBy($"doc_id")
  }

  private val mergeDetailOracle: String = {
    val bmCtes = BM25.oracleCtes(RetrievalPack.QueryTokens)
    s"""WITH $bmCtes,
       |prio AS (SELECT doc_id AS id, round(score, 4) AS rrf_score
       |  FROM bm25 ORDER BY score DESC, doc_id LIMIT 10),
       |dense AS (
       |  SELECT e.vec_id AS id,
       |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
       |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS score
       |  FROM embeddings e),
       |basel AS (SELECT id, score AS rrf_score
       |  FROM dense ORDER BY score DESC, id LIMIT 10),
       |tagged AS (
       |  SELECT id, rrf_score, 0 AS prio FROM prio
       |  UNION ALL SELECT id, rrf_score, 1 FROM basel),
       |merged AS (
       |  SELECT id, rrf_score,
       |    row_number() OVER (PARTITION BY id ORDER BY prio, rrf_score DESC) AS rn
       |  FROM tagged)
       |SELECT m.id AS doc_id, m.rrf_score, md5(d.text) AS text_md5, d.lang
       |FROM merged m JOIN documents d ON d.doc_id = m.id
       |WHERE m.rn = 1 ORDER BY doc_id""".stripMargin
  }

  // ---- q77: visual-element search ---------------------------------------

  val VisualQuery = "quarterly revenue table"

  /** Elements synthesized from the embeddings table (id, document_id,
    * element_type cycling table/figure/chart, 4×16 patch matrices from
    * the 64-dim vectors), persisted through the PACKED element store
    * ([[graft.sources.TableStore.savePages]]) and read back — the gate
    * pins the f32 blob round-trip plus the packed MaxSim kernel, not
    * just in-flight scoring. The real V13 path embeds the query
    * tokens, filters to the requested element types, and
    * MaxSim-scores the packed blobs. */
  def visualSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val elements = emb(spark, dir).select(
      concat(lit("el"), $"vec_id").as("id"),
      concat(lit("d"), ($"vec_id" / 10).cast("long")).as("document_id"),
      element_type($"vec_id").as("element_type"),
      transform(sequence(lit(0), lit(3)), p =>
        slice($"embedding".cast("array<double>"), p * 16 + 1, lit(16))).as("patches"))
    val tmp = graft.operators.TmpDirs.create("graft_q77_pages")
    graft.sources.TableStore.savePages(elements, tmp, dim = 16, sub = "elements")
    HybridSearch.visualElementSearch(
        graft.sources.TableStore.loadPages(spark, tmp, sub = "elements"),
        VisualQuery, 15, elementTypes = Seq("table", "figure"))
      .orderBy($"score".desc, $"id")
  }

  private def element_type(vecId: org.apache.spark.sql.Column) =
    when(vecId % 3 === 0, "table")
      .when(vecId % 3 === 1, "figure")
      .otherwise("chart")

  private val visualOracle: String = {
    // query tokens as literals; each single-token embedQuery(…, 16) is a
    // ±1 unit vector at bucket h%16, so MaxSim = Σ_t max_p sgn_t·patch_p[b_t]
    val toks = TextFunctions.tokenizeJvm(VisualQuery)
      .mkString("['", "', '", "']")
    val h = TextFunctions.hash56Sql("t")
    // ordered list_sum (not SUM-over-group) so the float addition order
    // matches the Scala MaxSim's query-row order exactly; the stored
    // side is the PACKED f32 blob, so patch values are quantized to
    // binary32 (CAST AS REAL round-trip) before the ±1-basis read
    s"""WITH els AS (
       |  SELECT 'el' || vec_id AS id, 'd' || (vec_id // 10) AS document_id,
       |    CASE CAST(vec_id % 3 AS INT) WHEN 0 THEN 'table' WHEN 1 THEN 'figure'
       |      ELSE 'chart' END AS element_type,
       |    list_transform(range(4), p -> list_transform(
       |      list_slice(CAST(embedding AS DOUBLE[]), p*16 + 1, p*16 + 16),
       |      x -> CAST(CAST(x AS REAL) AS DOUBLE))) AS patches
       |  FROM embeddings),
       |qb AS (SELECT list_transform($toks, t ->
       |    struct_pack(b := CAST($h % 16 AS INT),
       |      sgn := CASE WHEN (($h >> 7) & 1) = 1 THEN 1.0 ELSE -1.0 END)) AS ql),
       |scored AS (
       |  SELECT e.id, e.document_id, e.element_type,
       |    round(list_sum(list_transform(qb.ql, q ->
       |      list_max(list_transform(e.patches, pr -> q.sgn * pr[q.b + 1])))), 6) AS score
       |  FROM els e CROSS JOIN qb
       |  WHERE e.element_type IN ('table', 'figure'))
       |SELECT id, document_id, element_type, score FROM scored
       |ORDER BY score DESC, id LIMIT 15""".stripMargin
  }

  // ---- q78: quality routing over pinned fixtures ------------------------

  /** Fixture texts exercising every tier/routing branch (B6/B7 shapes):
    * clean markdown contract → hierarchical, plain prose → standard,
    * OCR-damaged → low, symbol soup + near-empty → garbage/manual. */
  val qualityFixtures: Seq[(Long, String)] = Seq(
    1L -> """# Contract Agreement
            |
            |This Agreement is entered into as of January 1, 2024.
            |
            |## Section 1: Definitions
            |
            |1.1 "Company" means ABC Corporation.
            |1.2 "Services" means the consulting services described in Exhibit A.
            |
            |## Section 2: Payment Terms
            |
            |The Client shall pay the Company according to the following schedule:
            |- Initial payment: $10,000 upon signing
            |- Monthly retainer: $5,000 per month""".stripMargin,
    2L -> ("The quick brown fox jumps over the lazy dog near the river bank. " +
      "It was a calm morning and the water moved slowly under the old bridge. " +
      "Several birds crossed the open sky while the town woke up in the distance."),
    3L -> """Th1s ls s0me p00rly sc4nned t3xt w1th l0ts 0f 0CR err0rs
            |and  m1ss1ng   characters    everywheeeeere
            |aaaabbbbcccc ||||||||||| ________
            |xyzqwrtp mjnbvcx asdfghjkl""".stripMargin,
    4L -> "|||| #### @@@@ %%%% &&&& **** (((( )))) ==== ++++ ~~~~ ^^^^ ```` {{{{ }}}} [[[[ ]]]]",
    5L -> "too short",
    // A8 probe: one 400-char line among tiny ones (length variance
    // ≫ 10000) plus >50% blank lines — both formatting penalties fire
    6L -> ("x" * 400 + "\n\nshort line here\n\n\n\nalpha\n\n\n\nbeta\n\n\n\ngamma\n\n\n\n"))

  /** Runs the REAL QualityAnalyzer over the fixtures; scores are exact
    * decimal-bounded doubles (weighted sums of small rationals) pinned
    * by the literal oracle. The format column additionally gates A8
    * (formatting variance: line-length spread / blank ratio / indents). */
  def qualityRouting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityFixtures.map { case (fid, text) =>
        val r = QualityAnalyzer.analyze(text)
        (fid, r.tier, r.chunkStrategy, r.recommendedPipeline,
          math.round(r.overallScore * 1e6) / 1e6,
          math.round(r.ocrScore * 1e6) / 1e6,
          math.round(r.structureScore * 1e6) / 1e6,
          math.round(r.formatScore * 1e6) / 1e6)
      }
      .toDF("fid", "tier", "strategy", "pipeline", "overall", "ocr",
        "structure", "format")
      .orderBy($"fid")
  }

  // pinned from a run of the Scala analyzer (grounded by
  // AcronymQualitySpec's tier/ordering assertions; the reference's own
  // scoring is lenient — short OCR samples cap out at "medium")
  private val qualityOracle: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), 'high', 'sdpm', 'hierarchical',
      |    CAST(0.85 AS DOUBLE), CAST(0.7 AS DOUBLE), CAST(0.6 AS DOUBLE),
      |    CAST(1.0 AS DOUBLE)),
      |  (CAST(2 AS BIGINT), 'high', 'sdpm', 'hierarchical',
      |    CAST(0.85 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |    CAST(1.0 AS DOUBLE)),
      |  (CAST(3 AS BIGINT), 'medium', 'semantic', 'standard',
      |    CAST(0.61 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |    CAST(1.0 AS DOUBLE)),
      |  (CAST(4 AS BIGINT), 'medium', 'semantic', 'standard',
      |    CAST(0.55 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |    CAST(1.0 AS DOUBLE)),
      |  (CAST(5 AS BIGINT), 'garbage', 'token', 'manual',
      |    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
      |    CAST(0.0 AS DOUBLE)),
      |  (CAST(6 AS BIGINT), 'low', 'sentence', 'simple',
      |    CAST(0.49 AS DOUBLE), CAST(0.75 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |    CAST(0.6 AS DOUBLE)))
      |t(fid, tier, strategy, pipeline, overall, ocr, structure, format)
      |ORDER BY fid""".stripMargin

  // ---- q86: vector sink round-trip (S7) ----------------------------------

  /** q86: the embeddings table through the vector sink — save → load →
    * explode per dimension. The oracle reads the SOURCE table directly,
    * so a store that loses a single ulp anywhere in 32,000 cells
    * hash-mismatches; this is the S7 persistence contract (float64
    * arrays round-trip parquet bit-exactly), gated end-to-end. */
  def vectorStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = TmpDirs.create("graft_q86_vec")
    graft.sources.TableStore.saveVectors(
      emb(spark, dir), "vec_id", "embedding", tmp)
    graft.sources.TableStore.loadVectors(spark, tmp)
      .select($"id".as("vec_id"), posexplode($"vec").as(Seq("dim", "value")))
      .select($"vec_id", $"dim".cast("long").as("dim"), $"value")
      .orderBy($"vec_id", $"dim")
  }

  private val vectorStoreOracle: String =
    """SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim,
      |  CAST(embedding AS DOUBLE[])[u.i] AS value
      |FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
      |ORDER BY vec_id, dim""".stripMargin

  // ---- q79: filter compiler + containment + projection + F8 -------------

  /** Query mixing the corpus's one rare term (positive idf) with two
    * common ones (negative idf): F8's positive-only filter keeps
    * exactly the docs whose rare-term contribution wins. */
  val FilterQueryTokens = Seq("dup", "spark", "join")

  /** The real F2 compiler (Eq + In + Range) over document rows carrying
    * a metadata map; the F5 containment conjunct uses the engine's map
    * idiom (`metadata['k'] = v`); F6 projects the store payload subset;
    * F8 keeps positive BM25 scores only. */
  def filterCompile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = BM25.score(docs(spark, dir), "doc_id", "text",
        FilterQueryTokens, positiveOnly = true)
      .select($"id".as("doc_id"), round($"score", 4).as("score"))
    val chunks = docs(spark, dir).withColumn("meta",
      map(lit("lang"), $"lang", lit("src"), $"source"))
    val pred = graft.model.Filters.compile(Map(
      "lang" -> graft.model.Filters.Eq("en"),
      "source" -> graft.model.Filters.In(Seq("src0", "src1", "src2", "src3",
        "src4", "src5", "src6", "src7")),
      "n_chars" -> graft.model.Filters.Range(gte = Some(100), lte = Some(400))))
    chunks.filter(pred)
      .filter($"meta" ("lang") === lit("en")) // F5 containment conjunct
      .join(scored, Seq("doc_id")) // F8: inner join keeps positive scores
      .select($"doc_id", $"lang", $"source", $"n_chars", $"score") // F6 payload
      .orderBy($"doc_id")
  }

  private val filterOracle: String = {
    val bmCtes = BM25.oracleCtes(FilterQueryTokens)
    s"""WITH $bmCtes,
       |pos AS (SELECT doc_id, round(score, 4) AS score FROM bm25 WHERE score > 0)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars, p.score
       |FROM documents d JOIN pos p USING (doc_id)
       |WHERE d.lang = 'en'
       |  AND d.source IN ('src0', 'src1', 'src2', 'src3', 'src4', 'src5', 'src6', 'src7')
       |  AND d.n_chars >= 100 AND d.n_chars <= 400
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_doc_upsert" -> (docUpsert _),
    "q74_cascade_delete" -> (cascadeDelete _),
    "q75_related_lookup" -> (relatedLookup _),
    "q76_merge_detail" -> (mergeDetail _),
    "q77_visual_search" -> (visualSearch _),
    "q78_quality_routing" -> (qualityRouting _),
    "q79_filter_compile" -> (filterCompile _),
    "q86_vector_store" -> (vectorStore _))

  val oracle: Map[String, String] = Map(
    "q73_doc_upsert" -> docUpsertOracle,
    "q74_cascade_delete" -> cascadeOracle,
    "q75_related_lookup" -> relatedOracle,
    "q76_merge_detail" -> mergeDetailOracle,
    "q77_visual_search" -> visualOracle,
    "q78_quality_routing" -> qualityOracle,
    "q79_filter_compile" -> filterOracle,
    "q86_vector_store" -> vectorStoreOracle)
}
