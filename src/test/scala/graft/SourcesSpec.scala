package graft

import org.apache.spark.sql.functions._

import graft.sources.{JsonlSource, TableStore}

/** Operational source paths: JSONL ingest with corrupt-line
  * quarantine, and small-files compaction. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL read quarantines corrupt lines instead of failing or dropping") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}""",
      """{"doc_id": 3, "text": "truncated...""", // malformed JSON
      """not json at all""",
      """{"doc_id": 4, "text": "ok", "lang": "de", "source": "s2"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val read = JsonlSource.readDocuments(spark, tmp)
    assert(read.good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L))
    assert(!read.good.columns.contains("_corrupt_record"))
    val rawBad = read.quarantined.collect().map(_.getString(0)).toSeq
    assert(rawBad.size == 2)
    assert(rawBad.exists(_.contains("not json at all")))
    // the good side feeds the normal pipeline unchanged
    val bundle = graft.ingest.Pipeline.ingest(
      read.good.select($"doc_id", $"text", $"source"), orgCol = Some("source"))
    assert(bundle.chunks.count() > 0)
    bundle.chunks.unpersist()
    read.release()
  }

  test("TSV read: clean rows parse, short/garbled rows quarantine") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tsv").toString
    val lines = Seq(
      "1\thello tab world\ten\ts1",
      "2\tbonjour\tfr\ts1",
      "not-a-number\tbroken row\ten\ts1",
      "3\tok\tde\ts2")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/part-0.tsv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val read = JsonlSource.readDocumentsCsv(spark, tmp, delimiter = "\t")
    assert(read.good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(read.quarantined.count() == 1)
    read.release()
  }

  test("compact rewrites a many-file table into the target file count, same rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val dir = s"$tmp/t"
    // simulate 12 append batches -> 12+ small files
    (0 until 12).foreach { b =>
      spark.range(b * 100L, (b + 1) * 100L).select(col("id"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 12)
    TableStore.compact(spark, dir, targetFileRows = 400L)
    assert(parquetFiles() == 3, s"got ${parquetFiles()} files")
    val rows = spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rows == (0L until 1200L).toSeq)
  }
}
