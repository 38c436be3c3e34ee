package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** Multi-vector (late-interaction) embedder speaking the
  * OpenAI-`/v1/embeddings` wire shape with a MATRIX per input — each
  * response item's `embedding` is a list of patch vectors rather than
  * one pooled vector, the convention multi-vector servers use when
  * exposing ColPali/ColBERT-family models over the embeddings route.
  * This closes the I10 seam symmetrically with
  * [[OpenAiEmbedder]]/I9 (reference: the ColPali model behind
  * `colpali_embedder.py:17-134`): point it at a patch-serving endpoint
  * and the page store populates from real model patches with no other
  * engine change —
  *
  * {{{
  * val cp = ColPaliEmbedder("http://localhost:8001", "vidore/colpali-v1.2", dim = 128)
  * val pages = cp.embedFrame(pageText, "page_text", "patches")
  * TableStore.savePages(pages.select($"document_id", $"page_number", $"patches"), root, dim = 128)
  * }}}
  *
  * …and the packed store feeds `HybridSearch.colpaliPropagate` /
  * `visualElementSearch` (q27/q50's layout) unchanged.
  *
  * Request: `POST {base}/v1/embeddings` with
  * `{"model": m, "input": [page, …]}`; response
  * `{"data": [{"index": i, "embedding": [[…], …]}, …]}`, re-ordered by
  * `index` (servers may legally reorder). Contract at the seam: every
  * patch vector must have length `dim` (loud failure — a silently
  * wrong dim corrupts the packed blobs); patch COUNT may vary per page
  * (real ColPali emits one patch per image token). Patch rows are
  * L2-normalized client-side by default because MaxSim's per-token max
  * of dots assumes unit patches.
  *
  * Execution shape matches the I9 adapter: `mapPartitions`, ONE
  * request per `batchSize` pages (patch matrices are ~1030×128 floats
  * each, so the default batch is small), null inputs pass through as
  * null rows without touching the server. Determinism caveat as with
  * [[OpenAiEmbedder]]: the correctness gates keep the deterministic
  * stand-in; this is the production adapter, spec-driven end-to-end
  * against an in-process server speaking the same wire shape
  * (ModelSeamSpec). */
final case class ColPaliEmbedder(baseUrl: String, model: String, dim: Int,
                                 batchSize: Int = 4,
                                 normalize: Boolean = true,
                                 apiKey: Option[String] = None) {

  /** Patch matrix for a query string (the query side of MaxSim). */
  def embedQuery(text: String): Array[Array[Double]] =
    ColPaliEmbedder.requestBatch(baseUrl, model, dim, normalize, apiKey,
      Seq(text)).head

  /** Adds `outCol: array<array<double>>` — one patch matrix per row —
    * from the server, batched per partition. Feed the result to
    * [[graft.sources.TableStore.savePages]] for the packed-f32
    * serving layout. */
  def embedFrame(df: DataFrame, inputCol: String,
                 outCol: String = "patches"): DataFrame = {
    val outSchema = df.schema.add(outCol,
      ArrayType(ArrayType(DoubleType)), nullable = true)
    val idx = df.schema.fieldIndex(inputCol)
    val (u, mo, d, bs, nz, key) = (baseUrl, model, dim, batchSize, normalize, apiKey)
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val texts: Seq[String] =
          batch.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        val live = texts.filter(_ != null)
        val embs =
          if (live.isEmpty) Seq.empty
          else ColPaliEmbedder.requestBatch(u, mo, d, nz, key, live)
        var k = 0
        batch.zip(texts).map { case (row, t) =>
          val m: Seq[Seq[Double]] =
            if (t == null) null
            else { val v = embs(k); k += 1; v.map(_.toSeq).toSeq }
          Row.fromSeq(row.toSeq :+ m)
        }
      }
    }(Encoders.row(outSchema))
  }
}

object ColPaliEmbedder {

  implicit private val formats: Formats = DefaultFormats

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  /** One multi-vector `/v1/embeddings` call: inputs in, per-input
    * patch MATRICES out (each patch `dim`-checked, optionally
    * row-normalized), re-ordered by the response's `index`. */
  private[functions] def requestBatch(baseUrl: String, model: String,
                                      dim: Int, normalize: Boolean,
                                      apiKey: Option[String],
                                      inputs: Seq[String]): Seq[Array[Array[Double]]] = {
    val body = compact(render(JObject(
      "model" -> JString(model),
      "input" -> JArray(inputs.map(JString(_)).toList))))
    val b = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/v1/embeddings"))
      .timeout(Duration.ofSeconds(300))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"multi-vector endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val data = (parse(resp.body()) \ "data") match {
      case JArray(items) => items
      case _ => throw new IllegalStateException(
        "multi-vector response has no data array")
    }
    if (data.size != inputs.size)
      throw new IllegalStateException(
        s"multi-vector endpoint returned ${data.size} matrices for ${inputs.size} inputs")
    val byIndex = data.map { item =>
      val i = (item \ "index").extractOpt[Int].getOrElse(
        throw new IllegalStateException("multi-vector item missing index"))
      val m = (item \ "embedding") match {
        case JArray(patches) => patches.map {
          case JArray(xs) => xs.map(_.extract[Double]).toArray
          case _ => throw new IllegalStateException(
            "multi-vector item is not a patch matrix (got a flat vector; " +
              "use OpenAiEmbedder for pooled single-vector endpoints)")
        }.toArray
        case _ => throw new IllegalStateException("multi-vector item missing embedding")
      }
      i -> m
    }.toMap
    (0 until inputs.size).map { i =>
      val m = byIndex.getOrElse(i,
        throw new IllegalStateException(s"multi-vector response missing index $i"))
      m.foreach { v =>
        if (v.length != dim)
          throw new IllegalStateException(
            s"multi-vector endpoint returned patch dim ${v.length}, expected $dim")
        if (normalize) {
          val n2 = v.foldLeft(0.0)((a, x) => a + x * x)
          if (n2 > 0.0) { val n = math.sqrt(n2); v.indices.foreach(j => v(j) /= n) }
        }
      }
      m
    }
  }
}
