package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: per-phase timing of the curation_bpe bench entry, to
  * attribute the BPE-mode delta over plain curation (histogram /
  * merge-training / encode / pack). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bpeprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), concat(col("text"), lit(".")).as("text"),
        col("lang"))
    val eval = docs.filter(col("doc_id") % 25 === 0).select(col("text"))

    // phase A: plain lazy curate (the baseline entry)
    time("plain curate+pack") {
      val out = graft.operators.TrainingPipeline.curate(
        docs, eval, "doc_id", "text", "lang", withReport = false)
      out.spans.write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()

    // phase B: bpe curate, instrumented — curate() itself is eager up
    // through merge training (clusters loop + histogram collects), so
    // time the call and the spans action separately
    var out2: graft.operators.TrainingPipeline.Output = null
    time("bpe curate() call (eager: clusters + merge training)") {
      out2 = graft.operators.TrainingPipeline.curate(
        docs, eval, "doc_id", "text", "lang", withReport = false,
        cfg = graft.operators.TrainingPipeline.Cfg(bpeSteps = Some(8)))
    }
    time("bpe spans action (encode join + pack + write)") {
      out2.spans.write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()

    // phase C: the BPE machinery standalone on the RAW corpus (q112
    // shape) for comparison
    time("standalone hist+train+encode+pack on raw docs") {
      val merges = graft.operators.Bpe.learnMerges(
        graft.operators.Bpe.wordHistogram(docs, "text", 20000), 8)
      val sized = graft.operators.Bpe.encode(docs, "doc_id", "text", merges)
        .select(col("id"), col("n_bpe").as("n_tokens"))
      graft.operators.Curation.packSequences(sized, "id", "n_tokens", 512L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()

    // phase D: decompose the in-pipeline eager part — run curate
    // lazily WITHOUT bpe to get the survivor frame, then time the
    // histogram and each merge-training sub-step against it
    val out3 = graft.operators.TrainingPipeline.curate(
      docs, eval, "doc_id", "text", "lang", withReport = false)
    time("warm survivors (spans action, plain)") {
      out3.spans.write.format("noop").mode("overwrite").save()
    }
    val survivors = out3.docs // (id, stratum, toks) — no text in plain mode
    time("survivors.count (cache-backed?)") { survivors.count(); () }
    val withText = survivors // hist needs text; approximate with toks join
    val textFrame = docs.select(col("doc_id").as("id"), col("text"))
      .join(withText.select(col("id")), Seq("id"), "left_semi")
    var hist: org.apache.spark.sql.DataFrame = null
    time("wordHistogram build+materialize (cached)") {
      hist = graft.operators.Bpe.wordHistogram(textFrame, "text", 10000).cache()
      hist.count(); ()
    }
    time("learnMerges 8 steps on PRE-CACHED hist") {
      graft.operators.Bpe.learnMerges(hist, 8); ()
    }
    spark.stop()
  }
}
