package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{LexicalOverlapScorer, RerankScorer, TextFunctions}

/** Rerank hook (V12, reference `src/retrieval/hybrid_search.py:576-625`):
  * the reference rescores (query, text) pairs with a cross-encoder
  * model, re-sorts, cuts. The scorer is the pluggable
  * [[graft.functions.RerankScorer]] seam; the in-engine default is the
  * deterministic lexical-overlap scorer (SURVEY §7 design stance — no
  * model inference in-engine): score = |q∩t| / |q| over BM25-tokenized
  * sets. Expressed as a column program so reranking a candidate set is
  * shuffle-free.
  */
object Rerank {

  /** Lexical overlap score of a text column against fixed query tokens. */
  def lexicalOverlap(text: Column, queryTokens: Seq[String]): Column =
    LexicalOverlapScorer.score(text, queryTokens)

  /** Rescore + re-sort + cut (T5). Scorer defaults to lexical overlap;
    * inject any [[RerankScorer]] for model-backed reranking. */
  def rerank(candidates: DataFrame, query: String, k: Int,
             scorer: RerankScorer = LexicalOverlapScorer): DataFrame = {
    val qTokens = TextFunctions.tokenizeJvm(query)
    candidates
      .withColumn("rerank_score", round(scorer.score(col("text"), qTokens), 6))
      .orderBy(col("rerank_score").desc, col("id"))
      .limit(k)
  }

  /** Model-backed rerank against a cross-encoder serving endpoint
    * (the reference's CrossEncoder role, `hybrid_search.py:576-625`,
    * behind the TEI `/rerank` protocol —
    * [[graft.functions.RemoteCrossEncoder]]): batched (query, text)
    * scoring in a `mapPartitions` pass, then the same re-sort + cut
    * as [[rerank]]. */
  def rerankRemote(candidates: DataFrame, query: String, k: Int,
                   ce: graft.functions.RemoteCrossEncoder): DataFrame =
    ce.scoreFrame(candidates, "text", query, "rerank_score")
      .withColumn("rerank_score", round(col("rerank_score"), 6))
      .orderBy(col("rerank_score").desc, col("id"))
      .limit(k)
}
