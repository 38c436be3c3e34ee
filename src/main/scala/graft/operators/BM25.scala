package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 keyword index + scoring as derived DataFrames.
  *
  * Mirrors the reference's in-memory rank_bm25 `BM25Okapi` index
  * (`src/storage/bm25_store.py:103-244`): k1=1.5, b=0.75, and the
  * rank_bm25 idf scheme — idf(t) = ln((N − df + 0.5)/(df + 0.5)),
  * negative idfs floored to ε·avg(idf) with ε=0.25. The reference
  * rebuilds the whole pickled index per mutation and scores serially
  * per query; here the index IS two DataFrames (postings + docfreq)
  * built by one explode + two hash aggregations, and scoring is a
  * broadcast join of the (tiny) query-term table against postings —
  * partial aggregation map-side, one shuffle on doc id, no driver
  * loops. At 100 TB the postings DF is partitioned by term block and
  * persists as Parquet; rebuild-on-write becomes partition-scoped
  * recompute (SURVEY §4).
  */
object BM25 {

  case class Params(k1: Double = 1.5, b: Double = 0.75, epsilon: Double = 0.25)

  /** Tokenized corpus: (id, toks, dl). */
  def corpus(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      TextFunctions.tokenize(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))

  /** Posting list (id, dl, term, tf) — the derived index table. */
  def postings(corpus: DataFrame): DataFrame =
    corpus.select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** Per-term document frequency. */
  def docFreq(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** Scores for a tokenized query over a corpus: (id, score), positive
    * scores only (reference `bm25_store.py:235`). Query terms are a bag
    * (duplicates weight double, as rank_bm25's get_scores iteration). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTokens: Seq[String], p: Params = Params(),
            positiveOnly: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val base = corpus(docs, idCol, textCol)
    val post = postings(base)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum($"dl").cast("double") / count(lit(1))).as("avgdl"))

    val idf0 = docFreq(post).crossJoin(broadcast(stats))
      .withColumn("idf0", log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
    val avgIdf = idf0.agg(avg($"idf0").as("avg_idf"))
    val idf = idf0.crossJoin(broadcast(avgIdf))
      .select($"term",
        when($"idf0" < 0, lit(p.epsilon) * $"avg_idf").otherwise($"idf0").as("idf"))

    val q = queryTokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .toDF("term", "qcount")

    post.join(broadcast(q), "term")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(stats.select($"avgdl")))
      .withColumn("term_score",
        $"idf" * ($"tf" * lit(p.k1 + 1.0)) /
          ($"tf" + lit(p.k1) * (lit(1.0) - lit(p.b) + lit(p.b) * $"dl" / $"avgdl")) *
          $"qcount")
      .groupBy($"id")
      .agg(sum($"term_score").as("score"))
      .filter(if (positiveOnly) $"score" > 0 else lit(true))
  }

  /** Top-k search (T1): deterministic tie-break on rounded score then id. */
  def search(docs: DataFrame, idCol: String, textCol: String,
             queryTokens: Seq[String], k: Int,
             p: Params = Params(),
             positiveOnly: Boolean = true): DataFrame = {
    val scored = score(docs, idCol, textCol, queryTokens, p, positiveOnly)
    scored.select(col("id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  // ---- DuckDB oracle twin ------------------------------------------------

  /** Shared CTE prefix computing (doc_id, dl, term, tf), stats, idf for
    * the `documents` table — the SQL twin of the DataFrame pipeline. */
  def oracleCtes(queryTokens: Seq[String], p: Params = Params()): String = {
    val toks = TextFunctions.tokenizeSql("text")
    val qvals = queryTokens.groupBy(identity).view.mapValues(_.size).toSeq.sorted
      .map { case (t, c) => s"('$t', $c)" }.mkString(", ")
    s"""tok AS (SELECT doc_id, $toks AS toks FROM documents),
       |base AS (SELECT doc_id, toks, len(toks) AS dl FROM tok),
       |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM base),
       |posting AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base) u GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
       |idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5)) AS idf0 FROM dfreq, stats),
       |aidf AS (SELECT AVG(idf0) AS avg_idf FROM idf0),
       |idf AS (SELECT term, CASE WHEN idf0 < 0 THEN ${p.epsilon} * avg_idf ELSE idf0 END AS idf FROM idf0, aidf),
       |q(term, qcount) AS (VALUES $qvals),
       |bm25 AS (
       |  SELECT p.doc_id,
       |    SUM(i.idf * (p.tf * ${p.k1 + 1.0}) / (p.tf + ${p.k1} * (1.0 - ${p.b} + ${p.b} * p.dl / s.avgdl)) * q.qcount) AS score
       |  FROM posting p JOIN q USING (term) JOIN idf i USING (term), stats s
       |  GROUP BY p.doc_id)""".stripMargin
  }
}
