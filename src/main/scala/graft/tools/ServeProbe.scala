package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-term diagnosis of the curate→serve composed probe cost: the
  * StreamBench SPARK_GRAFT_SERVE rehearsal body with each term —
  * curation survivors / serving ingest / state commit — timed
  * separately across successive batches, plus the session's
  * CacheManager entry count, so per-batch growth can be attributed
  * (this tool found the jaccardVerify shingle-cache leak: one 1900-node
  * entry per batch, re-optimized by recacheByPath on every state
  * append). Usage: ServeProbe [seedN] [nProbes]. */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val seedN = args.headOption.map(_.toInt).getOrElse(500)
    val nProbes = args.lift(1).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // CacheManager entry count (reflection — private[sql]); growth
    // across probes means a per-batch plan leak
    def cacheEntries: Int =
      try {
        val ssm = spark.getClass.getMethod("sharedState").invoke(spark)
        val cm = ssm.getClass.getMethod("cacheManager").invoke(ssm)
        val f = cm.getClass.getDeclaredFields
          .find(_.getName.contains("cachedData")).get
        f.setAccessible(true)
        f.get(cm).asInstanceOf[Seq[Any]].size
      } catch { case _: Throwable => -1 }
    import graft.streaming.CurationStream

    // SPARK_GRAFT_JOBS=1: per-job wall-clock attribution of the last
    // probe's curation term (driver-side planning gaps show up as
    // time BETWEEN jobs)
    val traceJobs = sys.env.contains("SPARK_GRAFT_JOBS")
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (traceJobs)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("|").take(90)))
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.get(j.jobId)
            if (s != null) jobLog.add(
              f"    job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.2fs  ${s._2}")
          }
        })

    val root = java.nio.file.Files.createTempDirectory("graft_serveprobe").toString
    val svc = new graft.serve.QueryService(spark, root)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_serveprobe_state").toString
    val seed = graft.Tables(spark, sfDir, "documents").limit(seedN)
      .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
        concat(col("text"), lit(".")).as("text"),
        lit("org_bench").as("organization_id"))
    println(f"seed: ${time(svc.ingestBatch(seed))}%.2f s")
    // scoped seed — matches the probes' tenant, so the corpus-side
    // dedup path genuinely runs (scoped/unscoped identities don't mix)
    println(f"state seed: ${
      time {
        CurationStream.curateBatch(
          graft.Tables(spark, sfDir, "documents").limit(seedN)
            .select(col("doc_id").as("id"),
              concat(col("text"), lit(".")).as("text"),
              lit("org_bench").as("scope")), stateDir)
      }}%.2f s")

    for (i <- 1 to nProbes) {
      val probe = graft.Tables(spark, sfDir, "documents")
        .filter(col("doc_id") % 97 === i).limit(20)
        .select(
          concat(lit(s"probe_${i}_"), col("doc_id"), lit(".md")).as("filename"),
          when(col("doc_id") % 2 === 0,
            concat(col("text"), lit(s". probe $i tail line.")))
            .otherwise(concat(lit(s"unique probe $i payload "),
              md5(concat(col("doc_id"), lit(i))), lit(" "), col("text"),
              lit(s" salted $i."))).as("text"),
          lit("org_bench").as("organization_id"))
      val withId = probe.withColumn("id",
        xxhash64(col("organization_id"), col("filename"), col("text")))
      var out: CurationStream.CurationOutcome = null
      if (traceJobs && i == nProbes) jobLog.clear()
      val tCur = time {
        out = CurationStream.curateSurvivorsDeferred(
          withId.select(col("id"), col("text"),
            col("organization_id").as("scope")), stateDir)
      }
      if (traceJobs && i == nProbes) {
        Thread.sleep(800) // drain listener bus
        println(s"  curate jobs (probe $i):")
        jobLog.forEach(l => println(l))
      }
      val tIngest = time {
        if (out.n > 0) {
          val keep = withId.join(broadcast(out.survivors.select(col("id"))),
            Seq("id"), "left_semi").drop("id")
          svc.ingestBatch(keep); ()
        }
      }
      val tCommit = time { out.commit() }
      out.release()
      println(f"probe $i: curate $tCur%.2f  ingest(${out.n}) $tIngest%.2f  " +
        f"commit $tCommit%.2f  cacheEntries $cacheEntries%d")
    }
    spark.stop()
  }
}
