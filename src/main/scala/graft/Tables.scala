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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

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
