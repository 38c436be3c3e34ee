package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Parameterized query profiler (diagnostics only — not part of the
  * library surface).
  *
  * Usage: `runMain graft.tools.Profile [query ...] [--sf DIR] [--runs N]
  * [--explain]`
  *
  * Times each named `SparkEntry.queries` entry over N runs (first run
  * reported separately as "cold"), prints the warm median, and with
  * `--explain` dumps the formatted physical plan. With no query names it
  * profiles the full suite. Replaces the six ad-hoc Profile*.scala mains
  * from earlier rounds.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var runs = 3
    var explain = false
    val names = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf"      => sfDir = args(i + 1); i += 2
        case "--runs"    => runs = args(i + 1).toInt; i += 2
        case "--explain" => explain = true; i += 1
        case q           => names += q; i += 1
      }
    }
    val wanted = {
      val ns = names.result()
      if (ns.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else ns
    }

    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classload warmup so the first query's cold time is the query's
    spark.range(1000).selectExpr("sum(id)").collect()

    // scheduler-job accounting per entry (the q113/cluster-RPC lens:
    // on a real master every job is a scheduler round-trip, so the
    // fixed job count is the per-call floor a cluster pays)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    for (name <- wanted) {
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: no such query")
        case Some(q) =>
          if (explain) q(spark, sfDir).explain("formatted")
          var lastJobs = 0
          val times = (0 until runs).map { _ =>
            spark.catalog.clearCache()
            Thread.sleep(120) // let queued listener events drain
            val j0 = jobs.get()
            val t0 = System.nanoTime()
            q(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            Thread.sleep(120)
            lastJobs = jobs.get() - j0
            dt
          }
          val warm = times.drop(1).sorted
          val med =
            if (warm.isEmpty) times.head
            else warm(warm.length / 2)
          println(f"$name%-28s cold ${times.head}%7.2f s   warm-median $med%7.2f s   jobs $lastJobs%3d   (n=$runs)")
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
