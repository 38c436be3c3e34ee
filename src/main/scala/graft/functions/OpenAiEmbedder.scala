package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** Dense embedder speaking the **OpenAI-compatible `/v1/embeddings`
  * protocol** — the de-facto serving standard implemented by vLLM,
  * text-embeddings-inference, Ollama, LM Studio, llamafile and the
  * hosted APIs, i.e. the worked real-endpoint example for the I9 model
  * seam (reference: the BGE model behind `dense_embedder.py:27-78`).
  * Point it at any such server and the whole engine — ingest, serving
  * store, hybrid search — runs on real model vectors with no other
  * change:
  *
  * {{{
  * val emb = OpenAiEmbedder("http://localhost:8000", "BAAI/bge-small-en-v1.5", dim = 384)
  * val svc = new QueryService(spark, storeRoot, embedder = emb)
  * }}}
  *
  * Request: `POST {base}/v1/embeddings` with
  * `{"model": m, "input": ["doc one text", …]}`; response
  * `{"data": [{"index": i, "embedding": [...]}, …]}` — vectors are
  * re-ordered by `index` per the spec, so servers that reorder are
  * handled.
  *
  * Execution shape matches [[ExternalEmbedder]]: `mapPartitions`, ONE
  * request per `batchSize` rows, null token rows pass through without
  * touching the server. Contract at the seam: vector length must equal
  * `dim` (loud failure — a silently wrong dim corrupts the index);
  * vectors are L2-normalized client-side (`normalize = true` default)
  * because not every server returns unit vectors and the engine's
  * cosine ≡ dot identity (V1) requires them — set it false only for a
  * server documented to normalize (then a violation fails loudly).
  *
  * Determinism caveat (why tests use a local stub): real model servers
  * may batch non-deterministically at the numeric edge; the engine's
  * own reproducibility gates keep the feature-hash stand-in. This
  * class is the production adapter, spec-driven end-to-end against an
  * in-process HTTP stub implementing the same protocol
  * (ModelSeamSpec). */
final case class OpenAiEmbedder(baseUrl: String, model: String,
                                override val dim: Int,
                                batchSize: Int = 32,
                                normalize: Boolean = true,
                                apiKey: Option[String] = None) extends Embedder {

  override def embed(tokens: Column): Column =
    throw new UnsupportedOperationException(
      "OpenAiEmbedder has no column kernel; use embedFrame (the model runs out-of-process)")

  override def embedQuery(tokens: Seq[String]): Array[Double] =
    OpenAiEmbedder.requestBatch(baseUrl, model, dim, normalize, apiKey,
      Seq(tokens.mkString(" "))).head

  override def embedFrame(df: DataFrame, tokensCol: String,
                          outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType), nullable = true)
    val idx = df.schema.fieldIndex(tokensCol)
    val (u, mo, d, bs, nz, key) = (baseUrl, model, dim, batchSize, normalize, apiKey)
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val toks: Seq[Seq[String]] =
          batch.map(r => if (r.isNullAt(idx)) null else r.getSeq[String](idx))
        val live = toks.filter(_ != null).map(_.mkString(" "))
        val embs =
          if (live.isEmpty) Seq.empty
          else OpenAiEmbedder.requestBatch(u, mo, d, nz, key, live)
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

object OpenAiEmbedder {

  implicit private val formats: Formats = DefaultFormats

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  /** One `/v1/embeddings` call: inputs in, `dim`-checked (optionally
    * normalized) vectors out, re-ordered by the response's `index`. */
  private[functions] def requestBatch(baseUrl: String, model: String,
                                      dim: Int, normalize: Boolean,
                                      apiKey: Option[String],
                                      inputs: Seq[String]): Seq[Array[Double]] = {
    val body = compact(render(JObject(
      "model" -> JString(model),
      "input" -> JArray(inputs.map(JString(_)).toList))))
    val b = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/v1/embeddings"))
      .timeout(Duration.ofSeconds(120))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"embeddings endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val data = (parse(resp.body()) \ "data") match {
      case JArray(items) => items
      case _ => throw new IllegalStateException(
        "embeddings response has no data array")
    }
    if (data.size != inputs.size)
      throw new IllegalStateException(
        s"embeddings endpoint returned ${data.size} vectors for ${inputs.size} inputs")
    val byIndex = data.map { item =>
      val i = (item \ "index").extractOpt[Int].getOrElse(
        throw new IllegalStateException("embeddings item missing index"))
      val v = (item \ "embedding") match {
        case JArray(xs) => xs.map(_.extract[Double]).toArray
        case _ => throw new IllegalStateException("embeddings item missing vector")
      }
      i -> v
    }.toMap
    (0 until inputs.size).map { i =>
      val v = byIndex.getOrElse(i,
        throw new IllegalStateException(s"embeddings response missing index $i"))
      if (v.length != dim)
        throw new IllegalStateException(
          s"embeddings endpoint returned dim ${v.length}, expected $dim")
      val n2 = v.foldLeft(0.0)((a, x) => a + x * x)
      if (normalize) {
        if (n2 > 0.0) { val n = math.sqrt(n2); v.indices.foreach(j => v(j) /= n) }
        v
      } else {
        if (n2 != 0.0 && math.abs(math.sqrt(n2) - 1.0) > 1e-6)
          throw new IllegalStateException(
            f"embeddings endpoint violated the unit-norm contract (|v| = ${math.sqrt(n2)}%.8f)")
        v
      }
    }
  }
}
