package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ingest.Pipeline

/** Structured Streaming extension (SURVEY §2.9: additive — the
  * reference has no streaming operators; this mirrors its
  * `search_queries`/job analytics shapes `init.sql:583-616` on the
  * `events` table, plus a streaming ingest path that reuses the batch
  * pipeline via foreachBatch — chunking/indexing are stateless
  * per-document, so batch logic is reused verbatim).
  */
object EventStream {

  /** events table schema (TESTDATA.md), ts as epoch-nanos long (the
    * historical driver parquet is TIMESTAMP(NANOS); newer generations
    * write TIMESTAMP(MICROS) NTZ — [[readEvents]] probes the on-disk
    * type and [[graft.Tables.normalizeTs]] reconciles both). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events-shaped parquet directory (or a
    * testdata sf dir — then only the events table file is streamed, so
    * foreign-schema siblings never inject all-null rows). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a glob (not a bare file path): FileStreamSource requires a
    // directory-rooted pattern, and the brace-glob pins the selection
    // to the events table file alone
    val path =
      if (new java.io.File(s"$dir/events.parquet").isFile) s"$dir/{events}.parquet"
      else dir
    // probe the on-disk ts type once (streams need a declared schema,
    // and declaring long against a TIMESTAMP(MICROS) file — or vice
    // versa — fails the scan); normalizeTs reconciles either form
    val tsType = spark.read.parquet(path).schema("ts").dataType
    val schema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(path))
  }

  /** Tumbling-window ingest-rate stats with watermark (event-time):
    * mirrors `search_queries` analytics rollups. */
  def windowedStats(events: DataFrame,
                    window_ : String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("approx_users"))

  /** Streaming document ingest: a docs-shaped stream goes through the
    * BATCH pipeline per micro-batch (foreachBatch), writing the chunk
    * fact table incrementally — the reference's request-driven ingest
    * (§3.2) lifted to a continuous source. */
  def ingestStream(docs: DataFrame, outDir: String,
                   checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val bundle = Pipeline.ingest(batch)
          bundle.chunks.write.mode("append").parquet(s"$outDir/chunks")
          bundle.postings.write.mode("append").parquet(s"$outDir/postings")
          // ingest caches the chunk table for its consumers; release it
          // per micro-batch or a long-running stream accumulates one
          // dead cached DataFrame per batch
          bundle.chunks.unpersist()
          ()
        }
      }

  /** docs-stream schema for [[readDocs]]/[[serveIngestStream]] — the
    * JSON ingest request's `docs[]` entries plus the tenant field. */
  val docSchema: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("text", StringType),
    StructField("organization_id", StringType)))

  /** JSONL document stream over a directory (one doc per line) — the
    * S5 directory scan lifted to a continuous source: files dropped in
    * after the stream starts arrive in later micro-batches, and the
    * checkpoint makes redelivery exactly-once per file. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).json(dir)

  /** Streaming ingest INTO THE SERVING STORE: each micro-batch merges
    * through [[graft.serve.QueryService.ingestBatch]] — the same
    * upsert merge, BM25 recompute, ANN/int8/PQ sidecar build, and
    * atomic generation flip as a JSON ingest — so documents dropped
    * into the watched directory become searchable at the next batch
    * boundary. `AvailableNow` drains what exists then stops (the
    * restart-driven shape the specs exercise); a long-lived deployment
    * swaps in a processing-time trigger, unchanged otherwise. */
  def serveIngestStream(svc: graft.serve.QueryService, docs: DataFrame,
                        checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { svc.ingestBatch(batch); () }
      }

  /** Streaming exact dedup: drop rows whose key was already seen
    * within the watermark horizon — the batch `Dedup.exactGroups`
    * lifted to a continuous source. `dropDuplicatesWithinWatermark`
    * (not plain `dropDuplicates`) is the 100 TB-stream shape: seen-key
    * state is EVICTED once the watermark passes it, so state is
    * O(distinct keys per horizon), not O(all keys ever) — unbounded
    * dedup state is the classic streaming-pipeline OOM. Works for
    * event streams (key = event_id) and document streams (key =
    * content hash): duplicates in the same micro-batch and across
    * batches both drop. */
  def dedupStream(rows: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** A closed user session: epoch-second bounds (sub-second precision
    * is floored identically by Spark's `unix_timestamp` and the
    * oracle's `floor(epoch(ts))`, keeping hash parity). */
  case class SessionOut(user_id: Long, session_start: Long,
                        session_end: Long, n_events: Long, sum_value: Double)

  /** Open-session state carried between micro-batches. */
  case class SessState(start: Long, last: Long, n: Long, sum: Double)

  /** Batch gaps-and-islands sessionization (the oracle-checkable twin
    * of [[sessionize]]): a session is a maximal run of a user's events
    * with gaps ≤ gapSec. Scales as a per-user window — partitioned by
    * user_id, never a global window. */
  def sessionizeBatch(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      .withColumn("new_sess",
        when(col("es") - lag(col("es"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id")))
          > gapSec, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        min(col("es")).as("session_start"),
        max(col("es")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .drop("sess_no")
  }

  /** Streaming sessionization via flatMapGroupsWithState (the stateful
    * §2.9 op): per-user session state with an event-time timeout at
    * last+gap. Sessions close either when a later in-batch event
    * overshoots the gap, or when the watermark passes the timeout
    * (hasTimedOut) with no new data for the user. State size is O(1)
    * per active user — the 100 TB-stream shape, no per-event state.
    * Double sums accumulate in event-time order (deterministic;
    * compare to the batch twin's exact decimal sum with a tolerance).
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800,
                 watermark: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n, s.sum))
          } else {
            val evs = it.map(e => (e._2.getTime / 1000, e._3)).toSeq.sortBy(_._1)
            val out = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            for ((t, v) <- evs) cur match {
              case Some(s) if t - s.last <= gapSec =>
                cur = Some(SessState(s.start, t, s.n + 1, s.sum + v))
              case Some(s) =>
                out += SessionOut(user, s.start, s.last, s.n, s.sum)
                cur = Some(SessState(t, t, 1, v))
              case None =>
                cur = Some(SessState(t, t, 1, v))
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapSec) * 1000)
            }
            out.result().iterator
          }
        })
  }

  /** Run a windowed-stats query to a memory sink synchronously (local
    * smoke path: batch parquet drives the stream to completion). */
  def runToMemory(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    val q = windowedStats(readEvents(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
