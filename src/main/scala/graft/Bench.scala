package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * Also times the master ingestion pipeline as "ingest_pipeline".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions()(_))
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up outside the measurement (tiny jobs, no
    // benchmark data touched): plain agg, decimal agg + sort (the
    // heavyweight codegen paths the first measured queries would
    // otherwise compile on the clock)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1000)
      .selectExpr("cast(id % 7 as string) k", "cast(id as decimal(18,4)) v")
      .groupBy("k").agg(org.apache.spark.sql.functions.expr("sum(v)"))
      .orderBy("k").collect()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_ONLY=q49,q87: comma-separated substring filter for
    // fast single-query iteration; unset = the full driver contract
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def wanted(name: String): Boolean =
      only.forall(_.exists(name.contains))

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if wanted(name)) {
      // each query is measured self-contained: operators cache their own
      // shared intermediates (self-join sides, iteration state), and
      // letting those accumulate across 50 queries distorts later
      // timings with storage-memory pressure
      spark.catalog.clearCache()
      results(name) = time { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
    }
    spark.catalog.clearCache()
    // ingestion throughput: documents -> chunks+postings (I1)
    if (wanted("ingest_pipeline")) results("ingest_pipeline") = time {
      val docs = Tables(spark, sfDir, "documents")
      val bundle = graft.ingest.Pipeline.ingest(docs, orgCol = Some("source"))
      bundle.chunks.write.format("noop").mode("overwrite").save()
      bundle.postings.write.format("noop").mode("overwrite").save()
    }

    spark.catalog.clearCache()
    // ColPali MaxSim at the reference's REAL page shape (~1030×128
    // patches/page, `vector_store.py:437-440`) over 1k pages — the
    // gates run toy grids, this is the memory/throughput rehearsal
    // (VERDICT r3 ask #4). ~1.05 MB/row; projection precedes the
    // top-k so the patch column never enters the exchange. Pages are
    // materialized to parquet OUTSIDE the clock (synthetic generation
    // is 132M hash calls of non-workload cost); the timed part is the
    // serving shape — scan the page store, score, top-k.
    if (wanted("maxsim_stress")) {
      val pagesDir = java.nio.file.Files
        .createTempDirectory("maxsim_pages").toString
      graft.tools.Synthetic.pages(spark, 1000, 1030, 128)
        .write.mode("overwrite").parquet(pagesDir)
      results("maxsim_stress") = time {
        graft.tools.Synthetic.maxsimTopK(
            spark.read.parquet(pagesDir),
            graft.tools.Synthetic.queryPatches(spark, 32, 128), 20)
          .write.format("noop").mode("overwrite").save()
      }
      // same workload over the packed f32 page store (one binary cell
      // per page, pack_f32/maxsim_f32): isolates how much of
      // maxsim_stress is nested-parquet decode vs math — and is the
      // layout the store would actually use at scale
      val packedDir = java.nio.file.Files
        .createTempDirectory("maxsim_packed").toString
      import org.apache.spark.sql.functions.col
      spark.read.parquet(pagesDir)
        .select(col("document_id"), col("page_number"),
          graft.functions.VectorFunctions.packF32(col("patches"), 128).as("packed"))
        .write.mode("overwrite").parquet(packedDir)
      results("maxsim_stress_packed") = time {
        graft.tools.Synthetic.maxsimTopKPacked(
            spark.read.parquet(packedDir),
            graft.tools.Synthetic.queryPatches(spark, 32, 128), 128, 20)
          .write.format("noop").mode("overwrite").save()
      }
    }

    spark.catalog.clearCache()
    // end-to-end curation throughput: scrub → dedups → decontaminate →
    // sample → sequence-pack (every stage the gated primitive)
    if (wanted("curation_pipeline")) results("curation_pipeline") = time {
      import org.apache.spark.sql.functions.{col, concat, lit}
      // the corpus is unpunctuated word salad — append a terminal stop
      // (gate-injection stance) so the C4 line rules see prose-shaped
      // lines instead of dropping every doc
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), concat(col("text"), lit(".")).as("text"),
          col("lang"))
      val eval = docs.filter(col("doc_id") % 25 === 0).select(col("text"))
      // production shape: no per-stage report jobs — one materializing
      // action on the packed spans
      val out = graft.operators.TrainingPipeline.curate(
        docs, eval, "doc_id", "text", "lang", withReport = false)
      out.spans.write.format("noop").mode("overwrite").save()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
