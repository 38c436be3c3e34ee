package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CurationStream

/** Scheduler-job accounting for the streaming curation path (VERDICT
  * r14 ask #1's before/after evidence): on a real cluster master every
  * Spark job is a scheduler RPC round-trip, so the per-micro-batch
  * FIXED job count — not the data volume — set q113's 41.8 s under
  * `local-cluster[2,16,8192]`. This tool counts jobs via a
  * SparkListener around (a) one representative [[CurationStream
  * .curateBatch]] micro-batch against a compacted + prune-forced state
  * (the q113/q114 shape) and (b) the whole q113 gate, and prints one
  * JSON line per probe.
  *
  * Usage: runMain graft.tools.JobCount [sfDir]
  * Env: SPARK_GRAFT_MASTER / SPARK_GRAFT_EXEC_CP as in Bench/Verify.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions()(_))
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXEC_CP")
      .foreach(cp => builder.config("spark.executor.extraClassPath", cp))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val trace = sys.env.contains("SPARK_GRAFT_JOB_TRACE")
    @volatile var tracing = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace && tracing) {
            val p = js.properties
            System.err.println(s"[jobtrace] ${js.jobId} " +
              s"stages=${js.stageInfos.size} " +
              s"desc=${Option(p.getProperty("spark.job.description"))
                .getOrElse("").take(100)}")
          }
          ()
        }
      })
    def drain(): Unit = Thread.sleep(400) // listener bus is async

    def measure(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      drain()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      tracing = true
      f
      tracing = false
      drain()
      println(f"""{"probe":"$name","jobs":${jobs.get() - j0},""" +
        f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    // (a) one micro-batch of the q113 shape: seeded state, compacted
    // tier, pruning forced on — the batch mixes cross/same-org exact
    // and near copies plus fresh docs, like the gate's b2
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
      .filter($"doc_id" < 500)
    def local(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    val orig = concat(substring($"text", 1, 150),
      lit(" closing marker sentence ends here."))
    val near = concat(substring($"text", 1, 150),
      lit(" closing marker sentence ends here today anyway."))
    val cfg = CurationStream.Cfg(statePruneMinBytes = 0L)
    val state = graft.operators.TmpDirs.create("graft_jobcount_state")
    val b1 = local(docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id".cast("long").as("id"), orig.as("text"),
        lit("orgA").as("scope")))
    val b2 = local(docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 10000000L).as("id"), orig.as("text"),
        lit("orgB").as("scope"))
      .unionByName(docs.filter($"doc_id" % 15 === 0)
        .select(($"doc_id" + 30000000L).as("id"), orig.as("text"),
          lit("orgA").as("scope")))
      .unionByName(docs.filter($"doc_id" % 15 === 5)
        .select(($"doc_id" + 40000000L).as("id"), near.as("text"),
          lit("orgA").as("scope")))
      .unionByName(docs.filter($"doc_id" % 25 === 1)
        .select(($"doc_id" + 50000000L).as("id"), orig.as("text"),
          lit("orgB").as("scope"))))
    CurationStream.curateBatch(b1, state, cfg)
    CurationStream.compactState(spark, state,
      targetBuckets = Some(CurationStream.StateBuckets))
    measure("curate_batch") {
      CurationStream.curateBatch(b2, state, cfg); ()
    }

    // (b) the whole q113 gate (3 batches + compaction + snapshot read)
    measure("q113_gate") {
      graft.operators.CurationGates.queries("q113_scoped_dedup")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
