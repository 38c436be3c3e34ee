package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Rerank hook (V12, reference `src/retrieval/hybrid_search.py:576-625`):
  * the reference rescores (query, text) pairs with a cross-encoder
  * model, re-sorts, cuts. The scorer is pluggable; the in-engine
  * default is a deterministic lexical-overlap scorer (SURVEY §7 design
  * stance — no model inference in-engine): score = |q∩t| / |q| over
  * BM25-tokenized sets. Expressed as a column program so reranking a
  * candidate set is shuffle-free.
  */
object Rerank {

  /** Lexical overlap score of a text column against fixed query tokens. */
  def lexicalOverlap(text: Column, queryTokens: Seq[String]): Column = {
    if (queryTokens.isEmpty) lit(0.0)
    else {
      val q = queryTokens.distinct
      size(array_intersect(
        array_distinct(TextFunctions.tokenize(text)),
        lit(q.toArray))).cast("double") / q.size
    }
  }

  /** Rescore + re-sort + cut (T5). Scorer defaults to lexical overlap;
    * inject any Column-valued scorer for model-backed reranking. */
  def rerank(candidates: DataFrame, query: String, k: Int,
             scorer: Option[(Column, Seq[String]) => Column] = None): DataFrame = {
    val qTokens = TextFunctions.tokenizeJvm(query)
    val fn = scorer.getOrElse(lexicalOverlap _)
    candidates
      .withColumn("rerank_score", round(fn(col("text"), qTokens), 6))
      .orderBy(col("rerank_score").desc, col("id"))
      .limit(k)
  }
}
