package graft.functions

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Batch-RPC dense embedder — the production shape of the I9 model
  * seam (reference boundary: the BGE embedder behind
  * `dense_embedder.py:27-78`, called in batches of 32 from the
  * pipeline, `master_pipeline.py:577-585`). The engine stays
  * model-free: this class ships ONLY its endpoint config
  * (host/port/dim/batchSize — a few serializable fields) to executors;
  * the model lives behind a TCP endpoint (an inference server, a
  * sidecar process).
  *
  * Execution shape: [[embedFrame]] is a `mapPartitions` pass — each
  * task walks its partition in `batchSize` groups and makes ONE
  * request per group, so the RPC count is rows/batchSize, never
  * per-row, and partitions embed independently (the whole pass scales
  * with the number of executors; no shuffle, no driver involvement).
  * Rows with null token arrays (the skip-embedding contract) are
  * passed through with null embeddings without touching the server.
  *
  * Contract enforcement at the seam: every returned vector must have
  * exactly `dim` entries and be unit-norm or all-zero (cosine ≡ dot
  * downstream, V1) — a server returning anything else fails the task
  * loudly rather than silently corrupting the index.
  *
  * Wire protocol (newline-delimited text — trivially implementable in
  * any serving stack, deterministic round-trip since
  * `Double.toString`/`toDouble` is exact): request = one line, docs
  * separated by TAB, tokens by space; response = one line, vectors
  * separated by TAB, dimensions by space. One connection per batch —
  * a production client would pool connections; the per-batch connect
  * keeps the client dependency-free and thread-safe here.
  *
  * [[embed]] (the Column form) is unsupported by design: an external
  * model has no Catalyst expression. Pipelines route through
  * [[Embedder.embedFrame]], which is exactly why that method is the
  * generic boundary.
  */
final case class ExternalEmbedder(host: String, port: Int,
                                  override val dim: Int,
                                  batchSize: Int = 32) extends Embedder {

  override def embed(tokens: Column): Column =
    throw new UnsupportedOperationException(
      "ExternalEmbedder has no column kernel; use embedFrame (the model runs out-of-process)")

  override def embedQuery(tokens: Seq[String]): Array[Double] =
    ExternalEmbedder.requestBatch(host, port, dim, Seq(tokens)).head

  override def embedFrame(df: DataFrame, tokensCol: String,
                          outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType), nullable = true)
    val idx = df.schema.fieldIndex(tokensCol)
    val (h, p, d, bs) = (host, port, dim, batchSize)
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val toks: Seq[Seq[String]] =
          batch.map(r => if (r.isNullAt(idx)) null else r.getSeq[String](idx))
        val live = toks.filter(_ != null)
        val embs =
          if (live.isEmpty) Seq.empty
          else ExternalEmbedder.requestBatch(h, p, d, live)
        var k = 0
        batch.zip(toks).map { case (row, t) =>
          val e: Seq[Double] =
            if (t == null) null else { val v = embs(k); k += 1; v.toSeq }
          Row.fromSeq(row.toSeq :+ e)
        }
      }
    }(Encoders.row(outSchema))
  }
}

object ExternalEmbedder {

  /** One batch request over the line protocol + the unit-norm/dim
    * contract check. Doc order in = vector order out. */
  private[functions] def requestBatch(host: String, port: Int, dim: Int,
                                      docs: Seq[Seq[String]]): Seq[Array[Double]] = {
    val socket = new Socket(host, port)
    try {
      val out = new PrintWriter(socket.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream))
      out.println(docs.map(_.mkString(" ")).mkString("\t"))
      val line = in.readLine()
      if (line == null)
        throw new IllegalStateException(s"embed server $host:$port closed mid-batch")
      val vecs = line.split("\t", -1).toSeq.map { s =>
        val v =
          if (s.isEmpty) Array.empty[Double]
          else s.split(" ").map(_.toDouble)
        if (v.length != dim)
          throw new IllegalStateException(
            s"embed server returned dim ${v.length}, expected $dim")
        val n2 = v.foldLeft(0.0)((a, x) => a + x * x)
        if (n2 != 0.0 && math.abs(math.sqrt(n2) - 1.0) > 1e-6)
          throw new IllegalStateException(
            f"embed server violated the unit-norm contract (|v| = ${math.sqrt(n2)}%.8f)")
        v
      }
      if (vecs.size != docs.size)
        throw new IllegalStateException(
          s"embed server returned ${vecs.size} vectors for ${docs.size} docs")
      vecs
    } finally socket.close()
  }
}
