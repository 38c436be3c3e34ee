package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.DoubleType
import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** Cross-encoder scoring over the **text-embeddings-inference
  * `/rerank` protocol** (`POST /rerank` with `{"query": q, "texts":
  * [...]}` → `[{"index": i, "score": s}, …]`) — the serving standard
  * for cross-encoder rerankers (TEI hosts BAAI/bge-reranker et al.;
  * Cohere's hosted API speaks the same shape). This is the V12 seam's
  * worked real-endpoint example (reference:
  * `hybrid_search.py:576-625`, a sentence-transformers CrossEncoder),
  * completing the adapter trio: dense embeddings
  * ([[OpenAiEmbedder]]), OCR (`ingest.RemoteOcrParser`), rerank
  * (this).
  *
  * Execution shape: [[scoreFrame]] is a `mapPartitions` pass — one
  * request per `batchSize` rows, each carrying the query + that
  * batch's texts, so candidate sets far beyond driver memory still
  * score distributed (the typical top-k·fetch rerank list is one
  * batch). Responses reassemble by `index` (servers may re-order).
  * Transport errors and 5xx fail the task loudly — a dead reranker
  * must not silently pass candidates through unscored. */
final case class RemoteCrossEncoder(baseUrl: String, batchSize: Int = 32,
                                    timeoutSeconds: Int = 120) {

  /** Append `outCol` (double) scoring each row's `textCol` against
    * `query`. Null texts score null. */
  def scoreFrame(df: DataFrame, textCol: String, query: String,
                 outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, DoubleType, nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    val (u, bs, ts, q) = (baseUrl, batchSize, timeoutSeconds, query)
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val texts: Seq[String] =
          batch.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        val live = texts.filter(_ != null)
        val scores =
          if (live.isEmpty) Seq.empty
          else RemoteCrossEncoder.requestBatch(u, ts, q, live)
        var k = 0
        batch.zip(texts).map { case (row, t) =>
          val s: java.lang.Double =
            if (t == null) null else { val v = scores(k); k += 1; v }
          Row.fromSeq(row.toSeq :+ s)
        }
      }
    }(Encoders.row(outSchema))
  }
}

object RemoteCrossEncoder {

  implicit private val formats: Formats = DefaultFormats

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  /** One `/rerank` call; scores returned in input order (reassembled
    * by the response's `index`). */
  private[functions] def requestBatch(baseUrl: String, timeoutSeconds: Int,
                                      query: String,
                                      texts: Seq[String]): Seq[Double] = {
    val body = compact(render(JObject(
      "query" -> JString(query),
      "texts" -> JArray(texts.map(JString(_)).toList))))
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/rerank"))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"rerank endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val items = parse(resp.body()) match {
      case JArray(xs) => xs
      case other => (other \ "results") match { // Cohere wraps in results
        case JArray(xs) => xs
        case _ => throw new IllegalStateException("rerank response is not a list")
      }
    }
    val byIndex = items.map { it =>
      val i = (it \ "index").extractOpt[Int].getOrElse(
        throw new IllegalStateException("rerank item missing index"))
      val s = (it \ "score").extractOpt[Double]
        .orElse((it \ "relevance_score").extractOpt[Double]) // Cohere field
        .getOrElse(throw new IllegalStateException("rerank item missing score"))
      i -> s
    }.toMap
    if (byIndex.size != texts.size)
      throw new IllegalStateException(
        s"rerank endpoint returned ${byIndex.size} scores for ${texts.size} texts")
    (0 until texts.size).map(i => byIndex.getOrElse(i,
      throw new IllegalStateException(s"rerank response missing index $i")))
  }
}
