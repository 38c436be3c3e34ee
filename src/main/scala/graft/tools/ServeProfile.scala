package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnosis harness for serving-store ingest latency: seeds
  * a store, then runs ONE single-document ingest with a job listener
  * attached, printing per-job wall time + first-stage name — tells
  * fixed Spark job overhead apart from real work so the O(delta)
  * ingest path can be tuned on evidence. */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_serveprof").toString
    val svc = new graft.serve.QueryService(spark, root)
    val seed = graft.Tables(spark, sfDir, "documents").limit(n)
      .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
        col("text"), lit("org_bench").as("organization_id"))
    svc.ingestBatch(seed)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(s => s"${s.name.takeWhile(_ != '\n')}[${s.numTasks}]")
            .mkString(" | ").take(140)))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, name) =>
          done.add(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $name")
        }
      }
    })

    import spark.implicits._
    val one = Seq(("probe_x.md",
      "Single-document latency probe with a steady payload of plain sentences.",
      "org_bench")).toDF("filename", "text", "organization_id")
    val t0 = System.nanoTime()
    svc.ingestBatch(one)
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    done.forEach(println)
    println(f"TOTAL single-doc ingest: $total%.2fs, jobs: ${done.size}")
    spark.stop()
  }
}
