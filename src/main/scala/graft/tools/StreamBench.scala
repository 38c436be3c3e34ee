package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CurationStream

/** Streaming-curation scale rehearsal (VERDICT r6 ask #7): the
  * [[CurationStream.curateBatch]] contract is per-batch cost
  * O(batch + candidate pairs), NEVER O(curated corpus). This tool
  * measures it: seed curated state at two sizes (sf0.1 ≈ 5k docs and
  * sf1-shaped ≈ 10× via [[ScaleUp.replicate]]), then time identical
  * fresh micro-batches against each. Flat probe times across a 10×
  * state are the empirical pin recorded in BASELINE.md.
  *
  * Usage: StreamBench [sfDir] [probeBatches] [probeSize]
  * Prints one JSON line:
  * {"<seedN>":{"seed_sec":…,"probe_secs":[…]}, …}
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbes = args.lift(1).map(_.toInt).getOrElse(5)
    val probeSize = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val base = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        concat(col("text"), lit(".")).as("text"))

    // distinct synthetic filler (60 unique hex words per doc): bulks
    // the curated STATE without tripping the near-dup drop — a
    // replica-salted corpus would (correctly) dedup back to 1× and the
    // state would never grow. Both states also seed the real sf docs,
    // so identical probe batches hit identical candidate sets and the
    // only variable is state size.
    def synthetic(n: Long) = spark.range(n)
      .select((col("id") + 5000000000L).as("id"),
        concat(concat_ws(" ", transform(sequence(lit(1), lit(60)),
          j => substring(md5(concat(col("id"), lit("_"), j)), 1, 8))),
          lit(".")).as("text"))

    val results = Seq(1, 10).map { factor =>
      val nBase = base.count()
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"graft_streambench_$factor").toString
      val seedSec = time {
        if (factor > 1)
          CurationStream.curateBatch(synthetic(nBase * (factor - 1)), stateDir)
        CurationStream.curateBatch(base, stateDir)
      }
      val seedN = spark.read.parquet(s"$stateDir/docs").count()
      // fresh probe batches: ids far above every seeded id, texts
      // salted per batch — near-dup-ish of corpus content, so the LSH
      // delta path and Jaccard verification genuinely run
      val probes = (1 to nProbes).map { i =>
        val probe = base.limit(probeSize)
          .select((col("id") + 9000000000L + i.toLong * 1000000L).as("id"),
            concat(col("text"), lit(s" probe batch $i distinct suffix"))
              .as("text"))
        time { CurationStream.curateBatch(probe, stateDir) }
      }
      (factor, seedN, seedSec, probes)
    }

    val json = results.map { case (f, n, s, ps) =>
      s""""x$f":{"seed_docs":$n,"seed_sec":${f"$s%.2f"},""" +
        s""""probe_secs":[${ps.map(p => f"$p%.2f").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
