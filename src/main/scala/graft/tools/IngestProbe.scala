package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: count + time every Spark job fired by one warm
  * single-document serving ingest (the ServeBench probe shape), to
  * locate the fixed driver-job floor. Not part of the product surface.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val svc = new graft.serve.QueryService(spark, root)
    val seed = graft.Tables(spark, sfDir, "documents").limit(n)
      .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
        col("text"), lit("org_bench").as("organization_id"))
    svc.ingestBatch(seed)
    import spark.implicits._
    // warm-up probe
    svc.ingestBatch(Seq(("w.md", "warm probe text", "org_bench"))
      .toDF("filename", "text", "organization_id"))

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var tBase = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        val det = js.stageInfos.lastOption.map(_.details.linesIterator
          .filter(_.contains("graft")).take(1).mkString).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), s"$site | $det"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val now = System.nanoTime()
          val off0 = (t0 - tBase) / 1e6
          val off1 = (now - tBase) / 1e6
          lines.add(f"job ${je.jobId}%4d [${off0}%7.0f -> ${off1}%7.0f ms]  $desc")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    tBase = t0
    svc.ingestBatch(Seq(("p.md", "single document latency probe payload", "org_bench"))
      .toDF("filename", "text", "organization_id"))
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq.sorted.foreach(println)
    println(f"INGEST TOTAL ${total}%.2f s over ${lines.size()} jobs")

    // same timeline for one warm search request (dense_mode=ann)
    svc.handle("""{"op":"search","organization_id":"org_bench","query":"latency probe payload","limit":5,"dense_mode":"ann"}""")
    lines.clear(); starts.clear()
    val t1 = System.nanoTime()
    tBase = t1
    svc.handle("""{"op":"search","organization_id":"org_bench","query":"latency probe payload","limit":5,"dense_mode":"ann"}""")
    val searchTotal = (System.nanoTime() - t1) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300)
    lines.asScala.toSeq.sorted.foreach(println)
    println(f"SEARCH TOTAL ${searchTotal}%.2f s over ${lines.size()} jobs")
    spark.stop()
  }
}
