package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted Reciprocal Rank Fusion (reference
  * `src/retrieval/hybrid_search.py:87-124`): score(id) =
  * Σ_methods w_m / (k + rank_m(id)), k = 60. Implemented as
  * union + hash aggregation (not an N-way join): each method's ranked
  * list contributes (id, w/(k+rank)) rows, one groupBy sums them.
  * Ranked lists are top-k sized (tiny), so every physical step is a
  * broadcast or a few-row shuffle regardless of corpus size.
  */
object Fusion {

  val RrfK = 60

  /** Assign 1-based ranks to a scored list: (id, score) → (id, rank).
    * Deterministic: ties broken by id (SURVEY risk #2). */
  def rank(scored: DataFrame): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("id"))
    scored.select(col("id"), row_number().over(w).as("rank"))
  }

  /** Fuse ranked lists with weights: (id, rrf_score). */
  def rrf(methods: Seq[(DataFrame, Double)], k: Int = RrfK): DataFrame =
    methods.map { case (ranked, w) =>
      ranked.select(col("id"), (lit(w) / (lit(k) + col("rank"))).as("contrib"))
    }.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("rrf_score"))

  /** Full fusion with final cut (T4). */
  def fuseTopK(methods: Seq[(DataFrame, Double)], limit: Int,
               k: Int = RrfK): DataFrame =
    rrf(methods, k)
      .select(col("id"), round(col("rrf_score"), 6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(limit)
}
