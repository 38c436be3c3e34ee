package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Exact dense-vector retrieval (reference dense path,
  * `src/storage/vector_store.py:230-273`): embeddings are normalized
  * (`dense_embedder.py:55-74`) so cosine ≡ dot product. The reference
  * delegates ANN to Qdrant HNSW; here retrieval is exact brute-force —
  * a single codegen'd projection over the (filtered, pruned) embedding
  * scan followed by TakeOrderedAndProject. Embarrassingly parallel: at
  * 100 TB the scan shards across executors with no shuffle at all
  * until the final k-row merge on the driver; the scale path beyond
  * that is the LSH-bucketed variant in [[Dedup]] (bucket join instead
  * of full scan).
  */
object DenseKnn {

  /** Score every row against one query vector: (id, score=dot). */
  def scoreAll(data: DataFrame, idCol: String, vecCol: String,
               query: DataFrame, queryVecCol: String): DataFrame = {
    val q = query.select(col(queryVecCol).as("__qvec"))
    data.crossJoin(broadcast(q))
      .select(col(idCol).as("id"),
        VectorFunctions.dot(col(vecCol), col("__qvec")).as("score"))
  }

  /** Filtered exact top-k (V1 + F9): deterministic rounded-score order. */
  def topK(data: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String, k: Int,
           threshold: Option[Double] = None): DataFrame = {
    val scored = scoreAll(data, idCol, vecCol, query, queryVecCol)
      .select(col("id"), round(col("score"), 6).as("score"))
    val thresholded = threshold.fold(scored)(t => scored.filter(col("score") >= t))
    thresholded.orderBy(col("score").desc, col("id")).limit(k)
  }

  /** Batch kNN: top-k per query id via ranking window — one shuffle on
    * query id, not a per-query job. */
  def topKBatch(data: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("__qvec"))
    val scored = data.crossJoin(broadcast(q))
      .select(col("qid"), col(idCol).as("id"),
        round(VectorFunctions.dot(col(vecCol), col("__qvec")), 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
