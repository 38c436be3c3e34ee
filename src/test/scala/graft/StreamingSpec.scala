package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming path (§2.9): windowed event-time stats driven
  * to completion by the batch parquet (AvailableNow), cross-checked
  * against the equivalent batch aggregation. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed stats match batch aggregation") {
    val q = EventStream.runToMemory(spark, sf0001, "stream_out")
    q.awaitTermination(120000)
    val streamed = spark.table("stream_out")
      .select($"window_start", $"event_type", $"n_events")

    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"))

    assert(streamed.count() > 0)
    // every streamed (window, type, count) row agrees with batch
    val mismatches = streamed.as("s").join(batch.as("b"),
        $"s.window_start" === $"b.window_start" &&
          $"s.event_type" === $"b.event_type" &&
          $"s.n_events" =!= $"b.n_events")
      .count()
    assert(mismatches == 0)
    // append mode withholds windows still above the final watermark (the
    // last ~2h of event time) — streamed is a prefix of batch
    val missing = batch.count() - streamed.count()
    assert(missing >= 0 && missing <= 4, s"missing=$missing")
  }

  test("streaming ingest via foreachBatch writes chunk + postings tables") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val docsDir = s"$tmp/in"
    Seq((10L, "streaming ingest document with payment terms and invoice details for testing", "org_s"))
      .toDF("doc_id", "text", "org")
      .write.parquet(docsDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, org STRING")
      .parquet(docsDir)
    val q = EventStream.ingestStream(stream, s"$tmp/out", s"$tmp/ckpt").start()
    q.awaitTermination(120000)

    val chunks = spark.read.parquet(s"$tmp/out/chunks")
    val postings = spark.read.parquet(s"$tmp/out/postings")
    assert(chunks.count() > 0)
    assert(postings.count() > 0)
    assert(chunks.filter($"document_id" === "10").count() > 0)
  }
}
