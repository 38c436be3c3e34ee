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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and truncate to
    * microseconds — the same ns→µs truncation DuckDB applies, so oracle
    * comparisons stay exact.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // integer division (`div`), not `/`: ns-since-epoch exceeds double
    // precision, so floating division would corrupt low-order digits
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
