package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway perf-diagnosis harness (not part of the library surface):
  * builds one SparkEntry query, prints plan stats, then times the
  * action with per-job wall-clock attribution so driver-side planning
  * time and executor time can be told apart. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q49_enhanced_fallback")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions()(_))
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ").take(120)))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobs.get(j.jobId)
        if (s != null) done.add(
          f"job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%8.2fs  ${s._2}")
      }
    })

    // Bench-only composite entries, reproduced with the Bench recipe so
    // their job mix can be attributed like any gate query
    def benchComposite(n: String): Option[(SparkSession, String) => org.apache.spark.sql.DataFrame] = n match {
      case "ingest_pipeline" => Some { (sp, dir) =>
        val docs = graft.Tables(sp, dir, "documents")
        val bundle = graft.ingest.Pipeline.ingest(docs, orgCol = Some("source"))
        bundle.chunks.write.format("noop").mode("overwrite").save()
        bundle.postings
      }
      case "curation_pipeline" => Some { (sp, dir) =>
        import org.apache.spark.sql.functions.{col, concat, lit}
        val docs = graft.Tables(sp, dir, "documents")
          .select(col("doc_id"), concat(col("text"), lit(".")).as("text"),
            col("lang"))
        val eval = docs.filter(col("doc_id") % 25 === 0).select(col("text"))
        graft.operators.TrainingPipeline.curate(
          docs, eval, "doc_id", "text", "lang", withReport = false).spans
      }
      case _ => None
    }

    var t0 = System.nanoTime()
    val df = benchComposite(name)
      .getOrElse(graft.SparkEntry.queries(name))(spark, sfDir)
    println(f"[scratch] build:    ${(System.nanoTime() - t0) / 1e9}%.2f s")

    t0 = System.nanoTime()
    val plan = df.queryExecution.executedPlan
    println(f"[scratch] plan:     ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"(${plan.toString.linesIterator.size} physical plan lines)")

    t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // drain listener bus
    println(f"[scratch] action:   $wall%.2f s wall")
    val lines = done.toArray(Array.empty[String]).sorted
    lines.foreach(println)
    val jobSum = lines.map(_.substring(8, 17).trim.dropRight(1).toDouble).sum
    println(f"[scratch] job time: $jobSum%.2f s summed — driver gap ≈ ${wall - jobSum}%.2f s")
    spark.stop()
  }
}
