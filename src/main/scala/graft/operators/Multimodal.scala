package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column processing: image/audio/video as opaque `binary`
  * columns with typed metadata (builder mandate; reference scope is
  * ColPali page images, `src/embeddings/colpali_embedder.py`).
  *
  * The Spark-side plumbing is real and tested — schema, partition-
  * preserving batch iteration, batch shape, null safety. The decode
  * itself is a clearly-marked deterministic stand-in (the container
  * has no image/audio codecs): it derives dimensions/features from
  * the bytes reproducibly, so specs and oracles can pin the dataflow
  * while a production deployment swaps `decodeBatch` for a codec or
  * model-server call with the SAME batch signature.
  *
  * Batching matters at scale: feature extraction is typically a
  * model-server / GPU call with per-call overhead, so the iterator is
  * processed in `batchSize` groups per partition (the `mapInPandas`
  * batch shape, expressed Scala-side) — one RPC per batch, not per
  * row, and no shuffle: extraction is partition-local.
  */
object Multimodal {

  /** Decoded media record (typed metadata + feature vector). */
  case class MediaFeature(
      id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double])

  val FeatureDim = 8

  /** DETERMINISTIC STAND-IN for the media decoder: dimensions and
    * features are pure functions of the bytes (md5-derived), so the
    * pipeline is reproducible end-to-end. A real deployment replaces
    * this with a codec/model call of the same signature: one batch of
    * (id, type, bytes) in, one batch of [[MediaFeature]] out. */
  def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeature] =
    batch.map { case (id, mtype, bytes) =>
      val b = Option(bytes).getOrElse(Array.emptyByteArray)
      val md = java.security.MessageDigest.getInstance("MD5").digest(b)
      def u(i: Int): Int = md(i) & 0xff
      val (w, h, frames) = mtype match {
        case "image/jpeg" | "image/png" => (64 + u(0) * 8, 64 + u(1) * 8, 1)
        case "video/mp4" => (64 + u(0) * 8, 64 + u(1) * 8, 1 + u(2))
        case _ => (0, 0, 1) // audio: no spatial dims, one "frame"
      }
      val feats = Array.tabulate(FeatureDim)(i => u(i % 16) / 255.0)
      MediaFeature(id, mtype, b.length.toLong, w, h, frames, feats)
    }

  /** Batch feature extraction over a media table with columns
    * (id long, media_type string, content binary). Partition-local,
    * shuffle-free; rows are fed to [[decodeBatch]] in `batchSize`
    * groups. */
  def extractFeatures(media: DataFrame, batchSize: Int = 32): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("id").cast("long"), col("media_type").cast("string"),
        col("content").cast("binary"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Frame sampling for video rows: every `stride`-th frame index up
    * to `maxFrames`, exploded to (id, frame_idx) — the row shape a
    * per-frame embedder consumes. Pure column program (codegen). */
  def sampleFrames(features: DataFrame, stride: Int = 8,
                   maxFrames: Int = 16): DataFrame =
    features
      .filter(col("n_frames") > 1)
      .select(col("id"), col("n_frames"),
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)),
          1, maxFrames)).as("frame_idx"))

  /** Resize metadata: target box preserving aspect ratio (the metadata
    * a resize stage would record; no pixels are touched here). */
  def resizePlan(features: DataFrame, maxSide: Int = 224): DataFrame = {
    val scale = least(
      lit(maxSide) / greatest(col("width"), lit(1)),
      lit(maxSide) / greatest(col("height"), lit(1)),
      lit(1.0))
    features.filter(col("width") > 0)
      .select(col("id"), col("width"), col("height"),
        round(col("width") * scale).cast("int").as("target_width"),
        round(col("height") * scale).cast("int").as("target_height"))
  }
}
