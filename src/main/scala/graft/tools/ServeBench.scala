package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-store ingest latency vs store size (VERDICT r4 ask #8's
  * measured form): seed a QueryService store with N documents from the
  * testdata corpus, then time single-document ingest batches. Under
  * the round-6 segmented layout the per-batch cost must be flat in N
  * (each batch writes one O(delta) segment + an O(vocab) derived
  * refresh); under the old snapshot-rewrite layout it was O(N).
  *
  * Usage: ServeBench [sfDir] [seedSizes...]  (defaults 500 2000 5000)
  * Prints one JSON line: {"seed_n": {"seed_sec":…, "probe_secs":[…]}}.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(500, 2000, 5000)
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

    val results = sizes.map { n =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_servebench_$n").toString
      val svc = new graft.serve.QueryService(spark, root)
      val seed = graft.Tables(spark, sfDir, "documents")
        .limit(n)
        .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
          col("text"), lit("org_bench").as("organization_id"))
      val seedSec = time { svc.ingestBatch(seed) }
      import spark.implicits._
      val probes = (1 to 3).map { i =>
        val one = Seq((s"probe_$i.md",
          s"Single-document latency probe $i with a steady payload of plain sentences.",
          "org_bench")).toDF("filename", "text", "organization_id")
        time { svc.ingestBatch(one) }
      }
      // search latency over the now-segmented store (base + 3 delta
      // segments): the read side pays the union fan-out, which must
      // stay flat in store size and small in segment count. Each
      // index-backed dense mode is timed (warm: min of 3).
      val searches = Seq("ann", "quantized", "ivfpq", "hnsw").map { mode =>
        mode -> (1 to 3).map { _ =>
          time {
            svc.handle("""{"op":"search","organization_id":"org_bench",""" +
              s""""query":"latency probe payload","limit":5,"dense_mode":"$mode"}""")
            ()
          }
        }.min
      }
      n -> (seedSec, probes, searches)
    }

    val json = results.map { case (n, (seedSec, probes, searches)) =>
      s""""$n":{"seed_sec":${f"$seedSec%.2f"},""" +
        s""""probe_secs":[${probes.map(p => f"$p%.2f").mkString(",")}],""" +
        s""""search_secs":{${searches.map { case (m, t) =>
          s""""$m":${f"$t%.2f"}""" }.mkString(",")}}}"""
    }.mkString("{", ",", "}")
    println(json)

    // compaction rehearsal (SPARK_GRAFT_COMPACT=1): run single-doc
    // ingests past MaxSegments on the largest store. Under TIERED
    // compaction the overflow batch takes a MINOR fold — the nine tiny
    // segments merge into one, base untouched, cost tracking delta
    // size (~a bulk-ingest of the accumulated deltas) — because nine
    // single-doc segments are nowhere near half the seeded base. The
    // pre-r8 behavior (full generation rebuild + quantizer retrain,
    // the 46 s spike that scaled with BASE size) now fires only when
    // accumulated deltas rival the base. Reports each batch's wall
    // time plus the fold tier actually taken (base name flip = major).
    if (sys.env.contains("SPARK_GRAFT_COMPACT")) {
      val n = sizes.max
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_servebench_compact").toString
      val svc = new graft.serve.QueryService(spark, root)
      val seed = graft.Tables(spark, sfDir, "documents").limit(n)
        .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
          col("text"), lit("org_bench").as("organization_id"))
      svc.ingestBatch(seed)
      val baseBefore = graft.sources.SegmentedStore.readManifest(root).get.base
      import spark.implicits._
      val steps = (1 to graft.sources.SegmentedStore.MaxSegments + 1).map { i =>
        val one = Seq((s"compact_probe_$i.md",
          s"Compaction rehearsal document $i with a steady plain-text payload.",
          "org_bench")).toDF("filename", "text", "organization_id")
        time { svc.ingestBatch(one) }
      }
      val mAfter = graft.sources.SegmentedStore.readManifest(root).get
      val tier = if (mAfter.base == baseBefore) "minor" else "major"
      println(s"""{"compact_store_docs":$n,"fold_tier":"$tier",""" +
        s""""segments_after":${mAfter.segments.size},"batch_secs":[${
        steps.map(s => f"$s%.2f").mkString(",")}]}""")
    }
    // tiered-fold escalation pin (SPARK_GRAFT_TIERED=1, VERDICT r13
    // ask #3's measurement): build a BIG folded tier, then overflow
    // again with single-doc deltas and time the fold. Under fold-ALL
    // the big tier was re-streamed every overflow (cost grows with the
    // tier); under the size-tiered foldSet the tail fold must be FLAT
    // in big-tier size and the big tier byte-untouched. Two tier sizes
    // prove the flatness; the manifest + file inventory prove the
    // non-rewrite.
    if (sys.env.contains("SPARK_GRAFT_TIERED")) {
      import spark.implicits._
      def inventory(root: String): Map[String, (Long, Long)] = {
        val p = java.nio.file.Paths.get(root)
        val s = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => (f.toString, (java.nio.file.Files.size(f),
              java.nio.file.Files.getLastModifiedTime(f).toMillis)))
            .toMap
        } finally s.close()
      }
      val out = Seq(200, 800).map { tierDocs =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_servebench_tier$tierDocs").toString
        val svc = new graft.serve.QueryService(spark, root)
        val docs = graft.Tables(spark, sfDir, "documents")
        // base: 3000 docs (sf0.1 holds 5000) — big enough that even the
        // 800-doc tier stays under the base/2 major-escalation line
        svc.ingestBatch(docs.filter(col("doc_id") < 3000)
          .select(concat(lit("doc_"), col("doc_id"), lit(".md")).as("filename"),
            col("text"), lit("org_bench").as("organization_id")))
        // build the big tier: 8 equal batches then an overflow batch →
        // fold-all of the 8 into one merged tier of ~tierDocs docs
        val per = tierDocs / 8
        (0 until 8).foreach { k =>
          svc.ingestBatch(docs
            .filter(col("doc_id") >= 3000 + k * per &&
              col("doc_id") < 3000 + (k + 1) * per)
            .select(concat(lit("big_"), col("doc_id"), lit(".md")).as("filename"),
              col("text"), lit("org_bench").as("organization_id")))
        }
        val buildFoldSec = time { svc.ingestBatch(Seq(("tier_cap.md",
          "Tier cap document with a steady plain payload of sentences.",
          "org_bench")).toDF("filename", "text", "organization_id")) }
        val m1 = graft.sources.SegmentedStore.readManifest(root).get
        val bigSeg = m1.segments.head
        val bigInv = inventory(root).filter(_._1.contains(s"/$bigSeg/"))
        // refill with singles and time the NEXT overflow fold
        (1 to graft.sources.SegmentedStore.MaxSegments - 1).foreach { i =>
          svc.ingestBatch(Seq((s"tail_$i.md",
            s"Tail probe $i with a steady plain payload of sentences.",
            "org_bench")).toDF("filename", "text", "organization_id"))
        }
        val tailFoldSec = time { svc.ingestBatch(Seq(("tail_cap.md",
          "Tail cap document with a steady plain payload of sentences.",
          "org_bench")).toDF("filename", "text", "organization_id")) }
        val m2 = graft.sources.SegmentedStore.readManifest(root).get
        val retained = m2.segments.contains(bigSeg)
        val untouched =
          inventory(root).filter(_._1.contains(s"/$bigSeg/")) == bigInv
        // ESCALATION fold (r15): keep ingesting tier-sized deltas until
        // the greedy fold-set pulls the big tier in, and time THAT
        // fold. The donor tier's HNSW graph rows must COPY verbatim
        // into the merged segment (graph CPU bounded by the tail; the
        // chunk re-stream stays the linear-IO term) — pinned by the
        // copied flag + the fold wall-clock.
        def graphKeys(dir: String): Set[(String, Int, Int)] =
          spark.read.parquet(dir)
            .select(col("organization_id"), col("pid"), col("entry"))
            .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
            .toSet
        val donorGraphs = graphKeys(s"$root/$bigSeg/hnsw")
        var escSec = -1.0
        var i = 0
        while (escSec < 0 && i < 24) {
          i += 1
          val sec = time { svc.ingestBatch(docs
            .filter(col("doc_id") >= (i - 1) * per && col("doc_id") < i * per)
            .select(concat(lit(s"esc_${i}_"), col("doc_id"), lit(".md"))
              .as("filename"),
              col("text"), lit("org_bench").as("organization_id"))) }
          if (!graft.sources.SegmentedStore.readManifest(root).get
              .segments.contains(bigSeg)) escSec = sec
        }
        val m3 = graft.sources.SegmentedStore.readManifest(root).get
        val copied = m3.segments.lastOption.exists(s =>
          donorGraphs.subsetOf(graphKeys(s"$root/$s/hnsw")))
        s""""tier_$tierDocs":{"build_fold_sec":${f"$buildFoldSec%.2f"},""" +
          s""""tail_fold_sec":${f"$tailFoldSec%.2f"},""" +
          s""""big_tier_retained":$retained,""" +
          s""""big_tier_untouched":$untouched,""" +
          s""""escalation_fold_sec":${f"$escSec%.2f"},""" +
          s""""donor_graphs_copied":$copied,""" +
          s""""segments_after":${m2.segments.size}}"""
      }
      println(out.mkString("{", ",", "}"))
    }
    spark.stop()
  }
}
