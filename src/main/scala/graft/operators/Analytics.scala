package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.TenantContext

/** Operational analytics tables (SURVEY §1.1): the `search_queries`
  * analytics log (reference `init.sql:583-616`, populated by
  * `EnhancedHybridSearcher.search` step 10) and the `processing_jobs`
  * tracking log (`init.sql:500-537`, `src/storage/metadata_store.py:
  * 360-420`).
  *
  * Both are APPEND-ONLY parquet logs — the natural Spark shape for
  * high-write-rate operational data at scale (no upserts on the hot
  * path; partition by organization_id/date in production). Job state
  * transitions are events; "current job state" is a derived view
  * (latest event per job), and every stats rollup is a plain
  * aggregation over the log.
  */
object Analytics {

  /** Append search-query records to the log (idempotence is the
    * caller's concern, as in the reference's INSERT-only table). */
  def appendSearchLog(records: DataFrame, path: String): Unit =
    records.write.mode("append").parquet(path)

  /** One log row from a completed search (§3.3 step 10): the
    * `search_queries` shape from the engine's SearchAnalytics record. */
  def searchRecord(spark: SparkSession, ctx: TenantContext,
                   a: graft.retrieval.HybridSearch.SearchAnalytics,
                   topScore: Option[Double] = None,
                   userId: Option[String] = None): DataFrame = {
    import spark.implicits._
    Seq((ctx.organizationId, ctx.workspaceId, userId,
        a.query, a.query_type, a.detected_domain, a.total_results,
        topScore, a.retrieval_methods, a.expansions,
        a.processing_time_ms, a.fallback_triggered))
      .toDF("organization_id", "workspace_id", "user_id", "query_text",
        "query_type", "detected_domain", "total_results",
        "top_result_score", "retrieval_methods", "acronyms_expanded",
        "processing_time_ms", "fallback_triggered")
      .withColumn("query_hash", md5(col("query_text")))
  }

  /** Rollup over the search log (the aggregation the reference's
    * idx_search_org / idx_search_hash / idx_search_type indexes exist
    * to serve): volume, result counts, latency, fallback rate and
    * distinct query shapes per (organization, query_type). */
  def searchRollup(log: DataFrame): DataFrame =
    log.groupBy(col("organization_id"), col("query_type"))
      .agg(
        count(lit(1)).as("n_queries"),
        sum(col("total_results")).cast("long").as("sum_results"),
        round(avg(col("processing_time_ms")), 4).as("avg_ms"),
        sum(when(col("fallback_triggered"), 1L).otherwise(0L)).as("n_fallback"),
        countDistinct(col("query_hash")).as("distinct_queries"))

  /** [[searchRollup]] with sketched distinct counts: exact
    * count_distinct shuffles every distinct (group, hash) pair; the
    * HyperLogLog++ sketch (rsd 1%) is a fixed-size mergeable state per
    * group — the rollup you run over the full 100 TB log, keeping the
    * exact form as the oracle baseline. */
  def searchRollupApprox(log: DataFrame): DataFrame =
    log.groupBy(col("organization_id"), col("query_type"))
      .agg(
        count(lit(1)).as("n_queries"),
        sum(col("total_results")).cast("long").as("sum_results"),
        round(avg(col("processing_time_ms")), 4).as("avg_ms"),
        sum(when(col("fallback_triggered"), 1L).otherwise(0L)).as("n_fallback"),
        approx_count_distinct(col("query_hash"), 0.01).as("distinct_queries"))

  /** Append job-state events to the log. An event row is
    * (job_id, organization_id, document_id, job_type, status,
    * progress_percent, retry_count, event_seq, ...). */
  def appendJobEvents(events: DataFrame, path: String): Unit =
    events.write.mode("append").parquet(path)

  /** Current job state: the latest event per job_id (highest
    * event_seq; ties — e.g. a retried writer double-appending one seq
    * — break deterministically by retry_count, then status, then
    * progress, so reruns always pick the same row; all four are part
    * of the documented event shape). One shuffle on job_id; at scale
    * the log is partitioned so the window stays within partitions. */
  def jobLatest(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("job_id")).orderBy(
      col("event_seq").desc, col("retry_count").desc,
      col("status").desc, col("progress_percent").desc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Job stats rollup (A4's job half, `metadata_store.py:1245-1291`):
    * counts by (job_type, status) over current states. */
  def jobStats(events: DataFrame): DataFrame =
    jobLatest(events).groupBy(col("job_type"), col("status"))
      .agg(count(lit(1)).as("n_jobs"),
        round(avg(col("progress_percent")), 4).as("avg_progress"),
        sum(col("retry_count")).cast("long").as("total_retries"))

  // ---- gates ---------------------------------------------------------

  private def docs(spark: SparkSession, dir: String) = Tables(spark, dir, "documents")

  // per-process unique dir: append-mode gates must start from a clean
  // log to be reproducible, and a FIXED path would let two concurrent
  // runs (bench + verify on one host) corrupt each other's logs;
  // deleted at JVM exit so repeated bench loops don't litter /tmp
  private def tmpDir(name: String): String =
    TmpDirs.create(s"graft_$name")

  /** q52: synthesize search-query records from `documents`, append in
    * TWO batches (proving append semantics), reload, roll up. The
    * oracle computes the same rollup straight from `documents`, so a
    * lossy append/reload would hash-mismatch. */
  def searchAnalytics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = docs(spark, dir).select(
      $"doc_id",
      $"source".as("organization_id"),
      concat(lit("q"), ($"doc_id" % 10).cast("string")).as("query_text"),
      // doc_id/20 decorrelates from the round-robin source assignment
      // so every org sees every query_type
      when(floor($"doc_id" / 20) % 4 === 0, "broad")
        .when(floor($"doc_id" / 20) % 4 === 1, "precise")
        .when(floor($"doc_id" / 20) % 4 === 2, "reference")
        .otherwise("comparative").as("query_type"),
      ($"n_chars" % 50).cast("int").as("total_results"),
      ($"n_chars" % 1000).cast("int").as("processing_time_ms"),
      ($"doc_id" % 7 === 0).as("fallback_triggered"))
      .withColumn("query_hash", md5($"query_text"))
    val path = tmpDir("graft_q52_search_log")
    appendSearchLog(recs.filter($"doc_id" % 2 === 0).drop("doc_id"), path)
    appendSearchLog(recs.filter($"doc_id" % 2 === 1).drop("doc_id"), path)
    searchRollup(spark.read.parquet(path))
      .orderBy($"organization_id", $"query_type")
  }

  /** q53: synthesize a 3-event lifecycle per document job (pending →
    * running → completed|failed), append in two batches, reload, and
    * compute current-state stats via the latest-event window. */
  def processingJobs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select(
      $"doc_id".as("job_id"),
      $"source".as("organization_id"),
      $"doc_id".cast("string").as("document_id"),
      when($"doc_id" % 4 === 0, "ingestion").when($"doc_id" % 4 === 1, "reindex")
        .when($"doc_id" % 4 === 2, "delete").otherwise("export").as("job_type"),
      ($"doc_id" % 13 === 0).as("fails"))
    val events = base.select($"job_id", $"organization_id", $"document_id",
        $"job_type", $"fails",
        explode(sequence(lit(0), lit(2))).as("event_seq"))
      .select($"job_id", $"organization_id", $"document_id", $"job_type",
        $"event_seq".cast("int").as("event_seq"),
        when($"event_seq" === 0, "pending").when($"event_seq" === 1, "running")
          .when($"fails", "failed").otherwise("completed").as("status"),
        when($"event_seq" === 0, 0).when($"event_seq" === 1, 50)
          .when($"fails", 75).otherwise(100).cast("int").as("progress_percent"),
        when($"event_seq" === 2 && $"fails", 1).otherwise(0).cast("int").as("retry_count"))
    val path = tmpDir("graft_q53_job_log")
    appendJobEvents(events.filter($"event_seq" < 2), path)
    appendJobEvents(events.filter($"event_seq" === 2), path)
    jobStats(spark.read.parquet(path))
      .orderBy($"job_type", $"status")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_search_analytics" -> (searchAnalytics _),
    "q53_processing_jobs" -> (processingJobs _),
  )

  val oracle: Map[String, String] = Map(
    "q52_search_analytics" ->
      """WITH recs AS (
        |  SELECT source AS organization_id,
        |    'q' || CAST(doc_id % 10 AS VARCHAR) AS query_text,
        |    CASE CAST(floor(doc_id / 20) AS BIGINT) % 4 WHEN 0 THEN 'broad' WHEN 1 THEN 'precise'
        |      WHEN 2 THEN 'reference' ELSE 'comparative' END AS query_type,
        |    CAST(n_chars % 50 AS INT) AS total_results,
        |    CAST(n_chars % 1000 AS INT) AS processing_time_ms,
        |    doc_id % 7 = 0 AS fallback_triggered,
        |    md5('q' || CAST(doc_id % 10 AS VARCHAR)) AS query_hash
        |  FROM documents)
        |SELECT organization_id, query_type,
        |  COUNT(*) AS n_queries,
        |  CAST(SUM(total_results) AS BIGINT) AS sum_results,
        |  round(AVG(processing_time_ms), 4) AS avg_ms,
        |  CAST(SUM(CASE WHEN fallback_triggered THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback,
        |  COUNT(DISTINCT query_hash) AS distinct_queries
        |FROM recs GROUP BY organization_id, query_type
        |ORDER BY organization_id, query_type""".stripMargin,
    "q53_processing_jobs" ->
      """WITH base AS (
        |  SELECT doc_id AS job_id,
        |    CASE doc_id % 4 WHEN 0 THEN 'ingestion' WHEN 1 THEN 'reindex'
        |      WHEN 2 THEN 'delete' ELSE 'export' END AS job_type,
        |    doc_id % 13 = 0 AS fails
        |  FROM documents),
        |events AS (
        |  SELECT job_id, job_type, s.seq AS event_seq,
        |    CASE WHEN s.seq = 0 THEN 'pending' WHEN s.seq = 1 THEN 'running'
        |      WHEN fails THEN 'failed' ELSE 'completed' END AS status,
        |    CASE WHEN s.seq = 0 THEN 0 WHEN s.seq = 1 THEN 50
        |      WHEN fails THEN 75 ELSE 100 END AS progress_percent,
        |    CASE WHEN s.seq = 2 AND fails THEN 1 ELSE 0 END AS retry_count
        |  FROM base, (SELECT unnest(range(3)) AS seq) s),
        |latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY job_id ORDER BY event_seq DESC) AS rn FROM events) t
        |  WHERE rn = 1)
        |SELECT job_type, status, COUNT(*) AS n_jobs,
        |  round(AVG(progress_percent), 4) AS avg_progress,
        |  CAST(SUM(retry_count) AS BIGINT) AS total_retries
        |FROM latest GROUP BY job_type, status
        |ORDER BY job_type, status""".stripMargin,
  )
}
