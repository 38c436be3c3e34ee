package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{TextPack, Dedup}

/** q35/q56 isolation profile (diagnostics only). */
object Profile5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("q35 cold") {
      TextPack.langId(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("q35 warm") {
      TextPack.langId(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("q56 cold") {
      TextPack.dedupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("q56 warm") {
      TextPack.dedupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // phase split: pairs vs clustering
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select($"doc_id", $"source",
      graft.functions.TextFunctions.tokenize($"text").as("toks"))
    val pert = base.filter($"doc_id" % 7 === 0 && size($"toks") >= 5)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"source",
        slice($"toks", lit(1), greatest(size($"toks") - 2, lit(0))).as("toks"))
    val dc = base.unionByName(pert)
    val sigs = Dedup.minhashSignatures(dc, "doc_id", "toks", 16)
    val cands = Dedup.lshCandidates(sigs, 4, 4)
    val pairs = Dedup.jaccardVerify(cands, dc, "doc_id", "toks")
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .filter($"jaccard" >= 0.4).cache()
    time("pairs only") { println("pairs=" + pairs.count()) }
    time("clusters only") {
      println("nodes=" + Dedup.clusters(pairs).count())
    }
    spark.stop()
  }
}
