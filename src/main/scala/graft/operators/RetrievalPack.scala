package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions, VectorFunctions}

/** Retrieval core query pack (SURVEY §2.8: V1-V5, A1-A3, J1, W1, T1-T4)
  * over the `documents` / `embeddings` testdata, each with a DuckDB
  * oracle twin. doc_id ≡ vec_id links the two tables (FIXTURES.md §A).
  */
object RetrievalPack {

  /** The fixed demo query for BM25-family checks (terms present in the
    * synthetic corpus vocabulary). */
  val QueryTokens = Seq("spark", "join", "filter")
  val FetchLimit = 60 // reference over-fetch: limit*3 with limit=20
  val Limit = 20

  private def docs(spark: SparkSession, dir: String) = Tables(spark, dir, "documents")
  private def emb(spark: SparkSession, dir: String) = Tables(spark, dir, "embeddings")

  /** V3 tokenizer, exploded with positions. */
  def tokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", posexplode(TextFunctions.tokenize($"text")).as(Seq("pos", "token")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"token")
      .orderBy($"doc_id", $"pos")
  }

  /** A1 corpus statistics: per-term df and total tf. */
  def termStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val post = BM25.postings(BM25.corpus(docs(spark, dir), "doc_id", "text"))
    post.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("total_tf"))
      .orderBy($"term")
  }

  /** A2/V4 full BM25 score set (positive only, F8). */
  def bm25Scores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BM25.score(docs(spark, dir), "doc_id", "text", QueryTokens,
      positiveOnly = false)
      .select($"id".as("doc_id"), round($"score", 4).as("score"))
      .orderBy($"doc_id")
  }

  /** T1 top-k BM25 search with deterministic ranks. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy($"score".desc, $"id")
    BM25.search(docs(spark, dir), "doc_id", "text", QueryTokens, Limit,
      positiveOnly = false)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select($"id".as("doc_id"), $"score", $"rank")
      .orderBy($"rank")
  }

  /** V1 exact dense kNN against the vec_id=0 query vector. */
  def denseKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding")
    DenseKnn.topK(e, "vec_id", "embedding", q, "embedding", Limit)
      .select($"id".as("vec_id"), $"score")
      .orderBy($"score".desc, $"vec_id")
  }

  /** F9 score-threshold filter over the dense scores. */
  def denseThreshold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding")
    DenseKnn.scoreAll(e, "vec_id", "embedding", q, "embedding")
      .select($"id".as("vec_id"), round($"score", 6).as("score"))
      .filter($"score" >= 0.2)
      .orderBy($"vec_id")
  }

  /** J1/A3 hybrid RRF fusion of BM25 + dense ranked lists. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bmRanked = Fusion.rank(
      BM25.search(docs(spark, dir), "doc_id", "text", QueryTokens, FetchLimit,
        positiveOnly = false))
    val e = emb(spark, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding")
    val dnRanked = Fusion.rank(
      DenseKnn.topK(e, "vec_id", "embedding", q, "embedding", FetchLimit))
    Fusion.fuseTopK(Seq((bmRanked, 0.3), (dnRanked, 0.5)), Limit)
      .select($"id".as("doc_id"), $"rrf_score")
      .orderBy($"rrf_score".desc, $"doc_id")
  }

  /** V2 MaxSim late interaction: embeddings reshaped to 8×8 patch
    * matrices, scored against the vec_id=0 patches. */
  def maxsim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = emb(spark, dir).select($"vec_id",
      transform(sequence(lit(0), lit(7)), r =>
        slice($"embedding".cast("array<double>"), r * 8 + 1, lit(8))).as("patches"))
    val q = pat.filter($"vec_id" === 0).select($"patches".as("qpatches"))
    pat.crossJoin(broadcast(q))
      .select($"vec_id",
        round(VectorFunctions.maxsim($"qpatches", $"patches"), 5).as("score"))
      .orderBy($"score".desc, $"vec_id")
      .limit(Limit)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_tokens" -> (tokens _),
    "q21_term_stats" -> (termStats _),
    "q22_bm25_scores" -> (bm25Scores _),
    "q23_bm25_topk" -> (bm25TopK _),
    "q24_dense_knn" -> (denseKnn _),
    "q25_dense_threshold" -> (denseThreshold _),
    "q26_rrf_fusion" -> (rrfFusion _),
    "q27_maxsim" -> (maxsim _),
  )

  // ---- oracle SQL --------------------------------------------------------

  private val toksSql = TextFunctions.tokenizeSql("text")
  private def bmCtes = BM25.oracleCtes(QueryTokens)

  val oracle: Map[String, String] = Map(
    "q20_tokens" ->
      s"""SELECT doc_id, pos, token FROM (
         | SELECT doc_id, unnest(list_transform($toksSql, (t, i) -> {'pos': CAST(i - 1 AS BIGINT), 'token': t}), recursive := true)
         | FROM documents) u
         |ORDER BY doc_id, pos""".stripMargin,
    "q21_term_stats" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |posting AS (SELECT doc_id, term, COUNT(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM tok) u GROUP BY doc_id, term)
         |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
         |FROM posting GROUP BY term ORDER BY term""".stripMargin,
    "q22_bm25_scores" ->
      s"""WITH $bmCtes
         |SELECT doc_id, round(score, 4) AS score FROM bm25 ORDER BY doc_id""".stripMargin,
    "q23_bm25_topk" ->
      s"""WITH $bmCtes,
         |pos AS (SELECT doc_id, round(score, 4) AS score FROM bm25)
         |SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |FROM pos ORDER BY score DESC, doc_id LIMIT ${Limit}""".stripMargin,
    "q24_dense_knn" ->
      s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qe FROM qv)), 6) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT ${Limit}""".stripMargin,
    "q25_dense_threshold" ->
      s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |scored AS (SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qe FROM qv)), 6) AS score FROM embeddings)
         |SELECT vec_id, score FROM scored WHERE score >= 0.2 ORDER BY vec_id""".stripMargin,
    "q26_rrf_fusion" ->
      s"""WITH $bmCtes,
         |bm25r AS (SELECT doc_id, round(score, 4) AS score FROM bm25),
         |bmrank AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM (SELECT * FROM bm25r ORDER BY score DESC, doc_id LIMIT ${FetchLimit}) t),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |dscore AS (SELECT vec_id AS doc_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qe FROM qv)), 6) AS score FROM embeddings),
         |drank AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM (SELECT * FROM dscore ORDER BY score DESC, doc_id LIMIT ${FetchLimit}) t),
         |contrib AS (
         |  SELECT doc_id, 0.3 / (60 + rank) AS c FROM bmrank
         |  UNION ALL
         |  SELECT doc_id, 0.5 / (60 + rank) AS c FROM drank)
         |SELECT doc_id, round(SUM(c), 6) AS rrf_score FROM contrib GROUP BY doc_id
         |ORDER BY rrf_score DESC, doc_id LIMIT ${Limit}""".stripMargin,
    "q27_maxsim" ->
      s"""WITH pat AS (SELECT vec_id, list_transform(range(8), r -> list_slice(CAST(embedding AS DOUBLE[]), r*8 + 1, r*8 + 8)) AS patches FROM embeddings),
         |qp AS (SELECT patches AS q FROM pat WHERE vec_id = 0)
         |SELECT vec_id,
         | round(list_sum(list_transform((SELECT q FROM qp), qrow -> list_max(list_transform(patches, prow -> list_dot_product(qrow, prow))))), 5) AS score
         |FROM pat ORDER BY score DESC, vec_id LIMIT ${Limit}""".stripMargin,
  )
}
