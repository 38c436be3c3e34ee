package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.functions.TextFunctions

/** DSIR selection-path comparison at scale (VERDICT r13 ask #4's
  * measurement): the exact TakeOrdered marker vs the
  * `approx_percentile` threshold path — the 100 TB shape, whose
  * selection term is one mergeable sketch + a driver scalar instead of
  * collecting/broadcasting frac·N ids. Prints one JSON line with both
  * wall times and selection counts (set agreement is spec-pinned at
  * gate scale by CurationSpec; at sweep scale the counts pin the
  * selection-rate tracking).
  *
  * Usage: runMain graft.tools.DsirBench [sfDir]
  */
object DsirBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions()(_))
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def docs = graft.Tables(spark, sfDir, "documents").select(
      col("doc_id").as("id"),
      TextFunctions.wsTokens(lower(col("text"))).as("toks"),
      (col("lang") === "en").as("tgt"))
    val total = docs.count()
    // fail fast on an empty corpus: total = 0 would make the rate
    // fields NaN, which is not a JSON literal — the artifact would be
    // unparseable downstream instead of obviously wrong here
    require(total > 0, s"documents table at $sfDir is empty; " +
      "DsirBench needs a non-empty corpus to report selection rates")

    def time(f: => Long): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def exactOnce() = time {
      Curation.importanceResample(docs, "id", "toks", "tgt")
        .filter(col("selected")).count()
    }
    def approxOnce() = time {
      Curation.importanceResampleApprox(docs, "id", "toks", "tgt")
        .filter(col("selected")).count()
    }
    // interleaved min-of-2 (E,A,E,A): both paths share the scoring
    // kernels, so a sequential protocol hands the second path warm JIT
    // — the first pass of each also serves as the other's warm-up
    val e1 = exactOnce(); val a1 = approxOnce()
    val e2 = exactOnce(); val a2 = approxOnce()
    val (tExact, nExact) = if (e1._1 <= e2._1) e1 else e2
    val (tApprox, nApprox) = if (a1._1 <= a2._1) a1 else a2
    println(
      s"""{"dsir":{"sf":"$sfDir","docs":$total,""" +
        f""""exact_sec":$tExact%.2f,"exact_selected":$nExact,""" +
        f""""approx_sec":$tApprox%.2f,"approx_selected":$nApprox,""" +
        f""""exact_rate":${nExact.toDouble / total}%.4f,""" +
        f""""approx_rate":${nApprox.toDouble / total}%.4f}}""")
    spark.stop()
  }
}
