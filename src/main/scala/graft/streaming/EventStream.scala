package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
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
    * driver parquet is TIMESTAMP(NANOS); see graft.Tables.events). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events-shaped parquet directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
        }
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
