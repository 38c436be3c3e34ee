package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal batch plumbing: schema, batch shape, determinism,
  * partition independence. The decode is the documented deterministic
  * stand-in — what's under test is the dataflow. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "image/jpeg", "fake jpeg bytes".getBytes("UTF-8")),
    (2L, "image/png", "fake png bytes".getBytes("UTF-8")),
    (3L, "video/mp4", "fake video bytes".getBytes("UTF-8")),
    (4L, "audio/wav", "fake audio bytes".getBytes("UTF-8")),
    (5L, "audio/wav", null.asInstanceOf[Array[Byte]]))
    .toDF("id", "media_type", "content")

  test("extractFeatures: typed schema, deterministic, null-safe") {
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(out.length == 5)
    assert(out.forall(_.features.length == Multimodal.FeatureDim))
    val img = out.find(_.id == 1L).get
    assert(img.width >= 64 && img.height >= 64 && img.n_frames == 1)
    assert(out.find(_.id == 3L).get.n_frames >= 1)
    val nullRow = out.find(_.id == 5L).get
    assert(nullRow.n_bytes == 0L && nullRow.width == 0)
    // bit-identical across runs (pure function of bytes)
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(out.zip(again).forall { case (a, b) =>
      a == b.copy(features = a.features) && a.features.sameElements(b.features) })
  }

  test("results are independent of partitioning and batch size") {
    val one = Multimodal.extractFeatures(media.repartition(1), batchSize = 2)
      .collect().sortBy(_.id).map(f => (f.id, f.width, f.features.toSeq)).toSeq
    val many = Multimodal.extractFeatures(media.repartition(5), batchSize = 32)
      .collect().sortBy(_.id).map(f => (f.id, f.width, f.features.toSeq)).toSeq
    assert(one == many)
  }

  test("decodeBatch sees batchSize-bounded groups (the RPC batch shape)") {
    // 5 rows in one partition with batchSize 2 → batches of 2,2,1
    val rows = (1L to 5L).map(i => (i, "image/jpeg", Array.fill(4)(i.toByte))).toSeq
    val sizes = rows.grouped(2).map(_.size).toSeq
    assert(sizes == Seq(2, 2, 1))
    // and the operator produces one output row per input row regardless
    val df = rows.toDF("id", "media_type", "content").repartition(1)
    assert(Multimodal.extractFeatures(df, batchSize = 2).count() == 5)
  }

  test("frame sampling and resize plan derive from the feature table") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats.toDF(), stride = 8, maxFrames = 16)
      .collect()
    // only the video row fans out, starting at frame 0
    assert(frames.forall(_.getAs[Long]("id") == 3L))
    assert(frames.map(_.getAs[Int]("frame_idx")).contains(0))
    assert(frames.length <= 16)

    val plan = Multimodal.resizePlan(feats.toDF(), maxSide = 224).collect()
    assert(plan.forall { r =>
      r.getAs[Int]("target_width") <= 224 && r.getAs[Int]("target_height") <= 224 })
    // aspect ratio preserved within rounding
    assert(plan.forall { r =>
      val (w, h) = (r.getAs[Int]("width").toDouble, r.getAs[Int]("height").toDouble)
      val (tw, th) = (r.getAs[Int]("target_width").toDouble, r.getAs[Int]("target_height").toDouble)
      math.abs(tw / th - w / h) < 0.1 })
  }
}
