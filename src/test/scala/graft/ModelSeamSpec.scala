package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, FeatureHashEmbedder, RerankScorer}
import graft.ingest.Pipeline
import graft.model.TenantContext
import graft.retrieval.{HybridSearch, Rerank}

/** The pluggable model seams (I9/V12): a second toy implementation
  * swaps in through Pipeline.ingest / HybridSearch.Config / Rerank
  * without any other code change, and the default path is unchanged
  * (the oracle gates pin it; here we pin trait-default equivalence). */
class ModelSeamSpec extends SparkSpec {
  import spark.implicits._

  /** Toy embedder: one-hot on token count mod dim — valid (unit norm),
    * deliberately unlike feature hashing. */
  case class TokenCountEmbedder(dim: Int = 8) extends Embedder {
    override def embed(tokens: Column): Column = {
      val idx = size(tokens) % dim
      transform(sequence(lit(0), lit(dim - 1)),
        i => when(i === idx, 1.0).otherwise(0.0))
    }
    override def embedQuery(tokens: Seq[String]): Array[Double] =
      Array.tabulate(dim)(i => if (i == tokens.size % dim) 1.0 else 0.0)
  }

  /** Toy scorer: shorter text wins — ignores the query entirely. */
  object BrevityScorer extends RerankScorer {
    override def score(text: Column, queryTokens: Seq[String]): Column =
      lit(1.0) / (length(text).cast("double") + 1.0)
  }

  private val docs = Seq(
    (1L, Seq.fill(12)("spark join filter merge window table scan").mkString(". "), "org1"),
    (2L, Seq.fill(12)("hash aggregate exchange broadcast partition pruning").mkString(". "), "org1"),
    (3L, Seq.fill(12)("sort shuffle spill codegen stage task").mkString(". "), "org1"))
    .toDF("doc_id", "text", "org")

  test("a second embedder swaps in through ingest and search config") {
    val bundle = Pipeline.ingest(docs, embedder = TokenCountEmbedder(),
      orgCol = Some("org"))
    // embeddings are one-hot at (token count mod 8)
    val doc1 = bundle.chunks.filter(col("id") === "1_doc")
      .select(col("embedding")).head().getSeq[Double](0)
    assert(doc1.count(_ == 1.0) == 1 && doc1.sum == 1.0)

    val out = HybridSearch.search(
      bundle.chunks, "spark join filter", TenantContext("org1"),
      cfg = HybridSearch.Config(limit = 3, embedder = TokenCountEmbedder(),
        levelFilter = None),
      index = Some(bundle.bm25Index))
    assert(out.count() > 0)
    assert(out.columns.contains("dense_score"))
  }

  test("default embedder path is FeatureHashEmbedder — bit-identical") {
    val viaDefault = Pipeline.ingest(docs, orgCol = Some("org"))
      .chunks.select(col("id"), col("embedding"))
    val viaExplicit = Pipeline.ingest(docs,
        embedder = FeatureHashEmbedder(64), orgCol = Some("org"))
      .chunks.select(col("id"), col("embedding"))
    assert(viaDefault.exceptAll(viaExplicit).isEmpty
      && viaExplicit.exceptAll(viaDefault).isEmpty)
  }

  test("a second rerank scorer swaps in and changes the order") {
    val cands = Seq(
      (1L, "spark join filter merge window table scan extra words here"),
      (2L, "spark join"),
      (3L, "unrelated text entirely")).toDF("id", "text")
    val lex = Rerank.rerank(cands, "spark join filter", 3)
      .select(col("id")).as[Long].collect().toSeq
    val brief = Rerank.rerank(cands, "spark join filter", 3, BrevityScorer)
      .select(col("id")).as[Long].collect().toSeq
    assert(lex.head == 1L) // full lexical overlap wins
    assert(brief.head == 2L) // shortest text wins
  }
}
