package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** High-tenant-cardinality rehearsal (VERDICT r8 ask #3): the
  * tenant-first partition layout (`tenant_schema.py:35-74` is the
  * reference's core invariant) is exercised everywhere at a handful of
  * orgs; a real deployment has thousands. The per-org directory ×
  * per-segment sidecar layout is then a small-files/listing-cost risk:
  * if store operations walk ALL org directories, seed/ingest/search
  * cost grows linearly in org count even though each touches one
  * tenant.
  *
  * This tool seeds one store per org count (docs spread round-robin
  * over n orgs), then times (a) a single-doc warm ingest into ONE org
  * and (b) tenant-scoped searches in ONE org. Flat-or-log latency
  * across a 10× org fan-out is the pin recorded in BASELINE.md; a
  * super-linear trend means org-hash bucketing (the
  * `TableStore.compact` machinery) must replace raw per-org dirs.
  *
  * Usage: OrgBench [sfDir] [orgCounts...]  (defaults 100 1000)
  * Prints one JSON line:
  * {"<orgs>":{"docs":…,"seed_sec":…,"probe_secs":[…],"search_secs":{…}}}
  */
object OrgBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val orgCounts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(100, 1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // fixed 2 docs per org: the variable across runs is org COUNT (and
    // with it total doc count — the realistic shape: more tenants, not
    // smaller ones), so per-tenant work is constant and any latency
    // growth is attributable to tenant fan-out in the store layout
    val results = orgCounts.map { nOrgs =>
      val nDocs = nOrgs * 2
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_orgbench_$nOrgs").toString
      val svc = new graft.serve.QueryService(spark, root)
      val seed = graft.Tables(spark, sfDir, "documents")
        .limit(nDocs)
        .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
          col("text"),
          concat(lit("org_"), lpad((col("doc_id") % nOrgs).cast("string"), 5, "0"))
            .as("organization_id"))
      val seedSec = time { svc.ingestBatch(seed) }
      import spark.implicits._
      val probes = (1 to 3).map { i =>
        val one = Seq((s"probe_$i.md",
          s"Single-document latency probe $i with a steady payload of plain sentences.",
          "org_00007")).toDF("filename", "text", "organization_id")
        time { svc.ingestBatch(one) }
      }
      val searches = Seq("exact", "ann", "hnsw").map { mode =>
        mode -> (1 to 3).map { _ =>
          time {
            svc.handle("""{"op":"search","organization_id":"org_00007",""" +
              s""""query":"latency probe payload","limit":5,"dense_mode":"$mode"}""")
            ()
          }
        }.min
      }
      nOrgs -> (nDocs, seedSec, probes, searches)
    }

    val json = results.map { case (n, (d, seedSec, probes, searches)) =>
      s""""$n":{"docs":$d,"seed_sec":${f"$seedSec%.2f"},""" +
        s""""probe_secs":[${probes.map(p => f"$p%.2f").mkString(",")}],""" +
        s""""search_secs":{${searches.map { case (m, t) =>
          s""""$m":${f"$t%.2f"}""" }.mkString(",")}}}"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
