package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated testdata star schema
  * (TESTDATA.md). At cluster scale these would be partitioned-by-tenant
  * Parquet/Delta directories (SURVEY §1.1); the read path is identical:
  * `spark.read.parquet` with Catalyst pushing filters/projections into
  * the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Floor below which a table is treated as broadcast-trivial and
    * never re-split (the extra exchange would cost more than the
    * parallelism buys). Overridable via spark.graft.scanSplitMinBytes. */
  val ScanSplitMinBytes: Long = 200L * 1024

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") events(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet")
    adaptiveSplit(spark, df, tableBytes(s"$sfDir/$name.parquet"))
  }

  /** Guide §2.5 input-skew fix, size-guarded: parquet scans parallelize
    * at ROW-GROUP granularity, and the driver fixtures are single-row-
    * group files — so every scan here lands on ONE task and all
    * row-local work (chunking, kernels, map-side partial aggregation)
    * serializes onto one core regardless of the master's size. When
    * the file is too small to fill the cores naturally (bytes / scan
    * split size < defaultParallelism) but big enough that per-row work
    * dominates an exchange, round-robin it across the cores right
    * after the read. At production scale the byte check never fires
    * (a 100 TB table has thousands of row groups); the branch exists
    * for exactly the pathological-layout class the guide names (one
    * huge unsplittable file, single-row-group writers). Results are
    * partition-order independent by the engine's own determinism
    * contract (hash-checked under this split by the full gate suite). */
  private def adaptiveSplit(spark: SparkSession, df: DataFrame,
                            bytes: Long): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val minBytes = spark.conf.getOption("spark.graft.scanSplitMinBytes")
      .map(_.toLong).getOrElse(ScanSplitMinBytes)
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (bytes >= minBytes && bytes / math.max(1L, maxSplit) + 1 < parts)
      df.repartition(parts)
    else df
  }

  private def tableBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isDirectory) Option(f.listFiles()).map(_.map(_.length()).sum)
      .getOrElse(0L)
    else f.length()
  }

  /** `events.ts` arrives in driver-generated parquet either as
    * TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so it
    * is read as long and truncated to microseconds (the same ns→µs
    * truncation DuckDB applies) — or, in newer generations, as a plain
    * TIMESTAMP(MICROS) NTZ column. Both normalize to a session-local
    * TIMESTAMP; the host/oracle run in UTC, so values are identical
    * across engines either way. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    normalizeTs(raw)
  }

  /** Normalize a `ts` column to TIMESTAMP regardless of source schema
    * (nanos-as-long / NTZ micros / already-timestamp). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // integer division (`div`), not `/`: ns-since-epoch exceeds
      // double precision, so floating division would corrupt digits
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
