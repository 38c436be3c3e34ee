package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, FeatureHashEmbedder, TextFunctions}
import graft.model.UnifiedChunk
import graft.operators.BM25

/** Master ingestion pipeline (I1, reference
  * `src/pipeline/master_pipeline.py:197-468`): parse → quality →
  * domain metadata → chunk → embed → index, all as one DataFrame flow.
  * Model stages (BGE/ColPali) use the deterministic stand-ins per
  * SURVEY §7; quality-GARBAGE docs skip embedding
  * (`document_quality.py:529-540`).
  *
  * Every stage is a pure column program or flatMap generator — the
  * whole ingest of a 100 TB corpus is a single shuffle-free map pass
  * followed by the postings aggregation.
  */
object Pipeline {

  case class IndexBundle(
      chunks: DataFrame, // UnifiedChunk rows + embedding column
      postings: DataFrame, // (id, dl, term, tf)
      docFreq: DataFrame, // (term, df)
      idf: DataFrame, // (term, idf) with ε-floor applied
      stats: DataFrame) { // (n_docs, avgdl)
    /** The BM25 read-path handle — what query time consumes instead of
      * re-deriving the index from raw chunks. */
    def bm25Index: BM25.Index = BM25.Index(postings, idf, stats)
  }

  /** Doc-id generation (I14, `document_processor.py:183-188`):
    * `{filename}_{md5(content)[:12]}`. */
  def documentId(filename: String, content: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${filename}_${hex.take(12)}"
  }

  /** Ingest documents (cols: doc_id, text + optional org/source) into
    * the chunk fact table with quality routing and embeddings. The
    * embedder is the pluggable model seam (I9) — defaults to the
    * deterministic feature-hash stand-in.
    *
    * `doc_id` must be unique across the WHOLE input — not merely per
    * org: chunk ids derive from it, and colliding chunk ids merge in
    * the postings aggregation (doubling term frequencies). Multi-tenant
    * callers ingesting content-derived ids should prefix them with the
    * tenant (as `serve.QueryService` does). */
  def ingest(docs: DataFrame, embedder: Embedder = FeatureHashEmbedder(),
             orgCol: Option[String] = None): IndexBundle = {
    val spark = docs.sparkSession
    import spark.implicits._

    val withOrg = orgCol match {
      case Some(c) => docs.withColumn("__org", col(c).cast("string"))
      case None => docs.withColumn("__org", lit("default"))
    }

    // quality → strategy routing (I2) + hierarchical chunking (I5) as a
    // flatMap generator; GARBAGE docs keep only the document-level chunk
    // and are flagged to skip embedding
    val chunker = new HierarchicalChunker()
    val chunks = withOrg.select(
        col("doc_id").cast("string").as("doc_id"), col("text"), col("__org"))
      .as[(String, String, String)]
      .flatMap { case (docId, text, org) =>
        val t = Option(text).getOrElse("")
        val report = QualityAnalyzer.analyze(t)
        val meta = DomainMetadata.extract(t)
        val base =
          if (report.tier == "garbage")
            Seq(UnifiedChunk(
              id = s"${docId}_doc", document_id = docId, text = t,
              chunk_index = 0, level = "document", organization_id = org))
          else chunker.chunk(t, docId, org)
        base.map(c => c.copy(
          quality_level = Some(report.tier),
          chunk_strategy = Some(report.chunkStrategy),
          document_type = Some(meta.documentType),
          metadata = c.metadata ++ meta.filterTags ++ Map(
            "skip_embedding" -> (report.tier == "garbage").toString)))
      }
      .toDF()

    // dense embedding stage (I9): skip for garbage. The chunk table is
    // cached: it feeds BOTH the metadata/vector sinks and the postings
    // aggregation below, and without materialization each consumer
    // re-runs the quality→chunk→embed pass (at cluster scale this is
    // the parquet write of the chunk fact table that everything else
    // derives from)
    // tokens are nulled for skip_embedding rows; the embedFrame seam
    // maps null tokens → null embedding in every implementation, so
    // the garbage-skip contract is embedder-independent
    val tokenized = chunks.withColumn("__toks",
      when(col("metadata").getItem("skip_embedding") === "true",
        lit(null).cast("array<string>"))
        .otherwise(TextFunctions.tokenize(col("text"))))
    val embedded = embedder.embedFrame(tokenized, "__toks", "embedding")
      .drop("__toks")
      .cache()

    // BM25 index (A1): paragraph-level chunks are the retrieval unit (F7)
    val retrievalUnits = embedded.filter(col("level") === "paragraph" ||
      col("level") === "document")
    val corpus = BM25.corpus(retrievalUnits, "id", "text")
    val postings = BM25.postings(corpus)
    val docFreq = BM25.docFreq(postings)
    val stats = BM25.stats(corpus)

    IndexBundle(embedded, postings, docFreq,
      BM25.idfTable(docFreq, stats), stats)
  }

  /** Upsert semantics (S6, `metadata_store.py:808-847`): delete-then-
    * insert by document — old rows for re-uploaded documents are
    * anti-joined away before the union. */
  def upsertChunks(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val docs = incoming.select(col("document_id")).distinct()
    existing.join(docs, Seq("document_id"), "left_anti")
      .unionByName(incoming, allowMissingColumns = true)
  }

  /** Cascade delete (I13, `master_pipeline.py:847-890`): remove a
    * document from every derived table. */
  def cascadeDelete(bundle: IndexBundle, documentIds: Seq[String]): IndexBundle = {
    val spark = bundle.chunks.sparkSession
    import spark.implicits._
    val ids = documentIds.toDF("document_id")
    val chunks = bundle.chunks.join(ids, Seq("document_id"), "left_anti")
    val keep = chunks.select(col("id"))
    // recompute df/idf/stats from surviving postings (partition-scoped
    // recompute per SURVEY §4, not whole-index rebuild)
    val postings = bundle.postings.join(keep, Seq("id"), "left_semi")
    val docFreq = BM25.docFreq(postings)
    val stats = postings.select(col("id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
        sum(col("dl")).as("sum_dl"))
    IndexBundle(chunks, postings, docFreq,
      BM25.idfTable(docFreq, stats), stats)
  }
}
