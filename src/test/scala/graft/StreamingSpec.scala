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

  test("streaming sessionize matches batch gaps-and-islands minus open sessions") {
    import org.apache.spark.sql.streaming.Trigger
    val events = EventStream.readEvents(spark, sf0001)
    val q = EventStream.sessionize(events, gapSec = 1800)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_out")

    val batch = EventStream.sessionizeBatch(Tables.events(spark, sf0001), 1800)

    // every emitted session agrees with the batch twin exactly on
    // bounds/count and within 1e-6 on the double-vs-decimal sum
    val joined = streamed.as("s").join(batch.as("b"),
      $"s.user_id" === $"b.user_id" && $"s.session_start" === $"b.session_start")
    assert(joined.count() == streamed.count(), "emitted session missing from batch twin")
    assert(joined.filter($"s.session_end" =!= $"b.session_end" ||
      $"s.n_events" =!= $"b.n_events" ||
      abs($"s.sum_value" - $"b.sum_value") > 1e-6).count() == 0)

    // sessions close in-batch (gap) or by the final timeout sweep once
    // the watermark reaches max event time; the only legitimately
    // missing ones are still open at end-of-stream: end + gap ≥ max ts
    val maxEs = Tables.events(spark, sf0001)
      .agg(max(unix_timestamp($"ts"))).collect().head.getLong(0)
    val missing = batch.as("b").join(streamed.as("s"),
      $"b.user_id" === $"s.user_id" && $"b.session_start" === $"s.session_start",
      "left_anti")
    assert(missing.filter($"session_end" + 1800 < maxEs).count() == 0,
      "a closed session was never emitted")
    assert(missing.count() >= 1, "expected at least one still-open session")
  }

  test("sessionize state times out via watermark (hasTimedOut path)") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    def write(file: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = s"$tmp/stage_$file"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/in/$file.parquet"))
    }
    val t0 = 1700000000L
    val ns = 1000000000L
    // file1: user 1's whole session; later files only advance the
    // watermark (user 2), so user 1's session can ONLY close by timeout
    write("f1", Seq((1L, t0 * ns, 1L, "click", 1.0, "{}"),
      (2L, (t0 + 10) * ns, 1L, "click", 2.0, "{}")))
    write("f2", Seq((3L, (t0 + 864000) * ns, 2L, "click", 1.0, "{}")))
    write("f3", Seq((4L, (t0 + 1728000) * ns, 2L, "click", 1.0, "{}")))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventStream.sessionize(stream, gapSec = 1800)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_timeout")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.table("sess_timeout").filter($"user_id" === 1L).collect()
    assert(out.length == 1, s"user 1 session not emitted: ${out.mkString}")
    assert(out.head.getAs[Long]("session_start") == t0)
    assert(out.head.getAs[Long]("session_end") == t0 + 10)
    assert(out.head.getAs[Long]("n_events") == 2L)
  }

  test("streaming dedup drops duplicates within and across micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    def write(file: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = s"$tmp/stage_$file"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/in/$file.parquet"))
    }
    val t0 = 1700000000L
    val ns = 1000000000L
    // f1 carries an in-batch duplicate of event 1; f2 re-sends event 2
    // (cross-batch duplicate, still inside the 10-minute horizon) plus
    // a genuinely new event 4
    write("f1", Seq(
      (1L, t0 * ns, 1L, "click", 1.0, "{}"),
      (1L, (t0 + 1) * ns, 1L, "click", 1.0, "{}"),
      (2L, (t0 + 2) * ns, 1L, "click", 2.0, "{}"),
      (3L, (t0 + 3) * ns, 2L, "view", 3.0, "{}")))
    write("f2", Seq(
      (2L, (t0 + 60) * ns, 1L, "click", 2.0, "{}"),
      (4L, (t0 + 61) * ns, 2L, "view", 4.0, "{}")))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventStream.dedupStream(stream, Seq("event_id"), "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.table("dedup_out").select($"event_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L), s"got $out")
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
