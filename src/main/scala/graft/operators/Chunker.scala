package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunking operators (reference I4/I5,
  * `src/chunking/chunking_service.py:210-753`).
  *
  * [[tokenWindows]] is the deterministic token-packing strategy (the
  * stand-in for model-based Chonkie strategies per SURVEY §7 stance):
  * fixed-size windows with overlap, one chunk per window start
  * 0, stride, 2·stride … — a pure `explode(sequence)` generator, no
  * shuffle, scales linearly. [[paragraphPack]] is the reference's
  * fallback chunker (`chunking_service.py:633-739`): split on blank
  * lines, greedily pack paragraphs up to maxChars.
  */
object Chunker {

  /** Fixed token windows with overlap: stride = winSize − overlap.
    * n ≤ winSize ⇒ one chunk; else 1 + ceil((n − winSize)/stride). */
  def tokenWindows(docs: DataFrame, idCol: String, toksCol: String,
                   winSize: Int, overlap: Int): DataFrame = {
    val stride = winSize - overlap
    require(stride > 0)
    val n = size(col(toksCol))
    docs
      .filter(n > 0)
      .withColumn("n_chunks",
        when(n <= winSize, lit(1L))
          .otherwise(lit(1L) + ceil((n - winSize) / lit(stride.toDouble)).cast("long")))
      .withColumn("chunk_index", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("ctoks",
        slice(col(toksCol), (col("chunk_index") * stride + 1).cast("int"), lit(winSize)))
      .select(col(idCol), col("chunk_index"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }

  /** DuckDB twin of [[tokenWindows]] over the `documents` table with a
    * token-list SQL fragment. */
  def tokenWindowsSql(toksSql: String, winSize: Int, overlap: Int): String = {
    val stride = winSize - overlap
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |c AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |nc AS (SELECT doc_id, toks,
       |  CASE WHEN n <= $winSize THEN 1 ELSE 1 + CAST(ceil((n - $winSize) / ${stride.toDouble}) AS BIGINT) END AS n_chunks FROM c),
       |ex AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_index FROM nc),
       |sl AS (SELECT doc_id, chunk_index,
       |  list_slice(toks, chunk_index * $stride + 1, chunk_index * $stride + $winSize) AS ctoks FROM ex)
       |SELECT doc_id, chunk_index, CAST(len(ctoks) AS BIGINT) AS n_tokens,
       |  array_to_string(ctoks, ' ') AS chunk_text
       |FROM sl""".stripMargin
  }

  /** Reference fallback chunker (`chunking_service.py:633-739`): split
    * text on blank lines, greedily pack paragraphs into chunks of at
    * most maxChars (a paragraph longer than maxChars becomes its own
    * chunk). Deterministic; used by the ingestion pipeline and pinned
    * by ScalaTest against the reference's demo behavior. */
  def paragraphPack(text: String, maxChars: Int): Seq[String] = {
    val paras = graft.ingest.HierarchicalChunker.ParaSep.split(text).map(_.trim).filter(_.nonEmpty)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    for (p <- paras) {
      if (cur.nonEmpty && cur.length + 2 + p.length > maxChars) {
        out += cur.toString
        cur.clear()
      }
      if (cur.nonEmpty) cur.append("\n\n")
      cur.append(p)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }
}
