package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * training-data-pipeline extensions) to a DataFrame job over the
  * testdata at `sfDir`; `oracleSql` carries the DuckDB-equivalent SQL
  * the driver uses as correctness oracle. Column names/aliases match
  * pairwise by construction.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the full read path — ingest documents through the master pipeline
    * (quality routing → hierarchical chunking → metadata → embeddings →
    * postings), then tenant-scoped hybrid BM25+dense RRF search. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val bundle = graft.ingest.Pipeline.ingest(docs, orgCol = Some("source"))
    // read path consumes the ingest-time index — queries touch only
    // their own terms' posting lists, never re-derive the index
    graft.retrieval.HybridSearch.search(
      bundle.chunks, "spark join filter merge window",
      graft.model.TenantContext("src3"),
      cfg = graft.retrieval.HybridSearch.Config(limit = 10),
      index = Some(bundle.bm25Index))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RetrievalPack.queries ++ TextPack.queries ++
      Analytics.queries ++ Curation.queries ++ Pii.queries ++
      IngestGates.queries ++ QueryGates.queries ++ StoreGates.queries ++
      Clean.queries ++ Quantize.queries ++ PqKnn.queries ++ Bpe.queries ++
      Classifier.queries ++ Hll.queries ++ Cms.queries ++ CurationGates.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ RetrievalPack.oracle ++ TextPack.oracle ++
      Analytics.oracle ++ Curation.oracle ++ Pii.oracle ++
      IngestGates.oracle ++ QueryGates.oracle ++ StoreGates.oracle ++
      Clean.oracle ++ Quantize.oracle ++ PqKnn.oracle ++ Bpe.oracle ++
      Classifier.oracle ++ Hll.oracle ++ Cms.oracle ++ CurationGates.oracle
}
