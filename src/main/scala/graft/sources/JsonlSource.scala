package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines document source: how training corpora actually arrive
  * (one JSON object per line, thousands of gzip'd part files). Reads
  * with an EXPLICIT schema — schema inference is a full extra pass
  * over 100 TB — in PERMISSIVE mode with a corrupt-record column, so
  * one malformed line quarantines instead of failing a billion-line
  * read (FAILFAST) or silently vanishing (DROPMALFORMED).
  */
object JsonlSource {

  /** documents-shaped schema (TESTDATA.md) + the quarantine column. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt_record", StringType)))

  /** A quarantining read: `good` has clean rows without the quarantine
    * column; `quarantined` keeps the raw offending line for repair /
    * audit. Both views share one cached parsed batch (Spark requires
    * caching before filtering on the corrupt column — the parser
    * short-circuits otherwise); call [[JsonlRead.release]] once both
    * sides are consumed, since unpersisting the derived frames would
    * be a no-op against the underlying cache. */
  final case class JsonlRead(good: DataFrame, quarantined: DataFrame,
                             private val parsed: DataFrame) {
    def release(): Unit = { parsed.unpersist(); () }
  }

  /** Read a JSONL directory/file into a quarantining [[JsonlRead]]. */
  def readDocuments(spark: SparkSession, path: String,
                    schema: StructType = documentSchema): JsonlRead = {
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    split(parsed)
  }

  /** CSV/TSV sibling of [[readDocuments]] — same explicit-schema +
    * PERMISSIVE + quarantine stance (`delimiter` = "\t" for TSV).
    * multiLine stays off: splittable files, a quoted-newline corpus
    * should be JSONL instead. */
  def readDocumentsCsv(spark: SparkSession, path: String,
                       delimiter: String = ",", header: Boolean = false,
                       schema: StructType = documentSchema): JsonlRead = {
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("delimiter", delimiter)
      .option("header", header)
      .csv(path)
      .cache()
    split(parsed)
  }

  /** Terminal training-data export: JSONL shards in a deterministic
    * shuffled order. Training runs want (a) documents in a fixed
    * pseudo-random order — no source/time clustering from the
    * pipeline's natural output order — and (b) bounded shard files.
    * Ordering by a salted hash of the id gives a reproducible shuffle
    * (same salt ⇒ byte-identical shard assignment across reruns) via a
    * range-partitioned sort — distributed, no single-task funnel; and
    * `maxRecordsPerFile` caps shard size without an exact global
    * row-number pass. Files compress with the given codec ("none" to
    * disable; training corpora usually ship gzip'd). */
  def writeShuffledShards(df: DataFrame, idCol: String, path: String,
                          maxRecordsPerFile: Long, salt: String,
                          codec: String = "gzip"): Unit = {
    val key = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 14), 16, 10).cast("long")
    df.withColumn("__shuffle_key", key)
      .orderBy(col("__shuffle_key"), col(idCol))
      .drop("__shuffle_key")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec)
      .mode("overwrite")
      .json(path)
  }

  private def split(parsed: DataFrame): JsonlRead = {
    val good = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    JsonlRead(good, quarantined, parsed)
  }
}
