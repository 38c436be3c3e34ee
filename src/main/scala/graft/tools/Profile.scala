package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Ad-hoc stage profiler for the dedup pipeline (diagnostics only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("tokenize") {
      docs.select(TextFunctions.tokenize($"text").as("toks"))
        .selectExpr("sum(size(toks))").collect(); docs.count()
    }
    val toks = docs.select($"doc_id", TextFunctions.tokenize($"text").as("toks"))
    time("shingles") {
      toks.select(TextFunctions.shingles($"toks", 3).as("sh"))
        .selectExpr("sum(size(sh))").collect(); 0L
    }
    time("shingle hashes") {
      toks.select(transform(TextFunctions.shingles($"toks", 3),
          s => TextFunctions.hash56(s) % TextFunctions.P31).as("hs"))
        .selectExpr("sum(size(hs))").collect(); 0L
    }
    time("minhash k=16") {
      toks.select(HashFunctions.minhashSig(
          transform(TextFunctions.shingles($"toks", 3),
            s => TextFunctions.hash56(s) % TextFunctions.P31), 16).as("sig"))
        .selectExpr("sum(size(sig))").collect(); 0L
    }
    time("minhash via precomputed hs") {
      toks.select(transform(TextFunctions.shingles($"toks", 3),
          s => TextFunctions.hash56(s) % TextFunctions.P31).as("hs"))
        .select(HashFunctions.minhashSig($"hs", 16).as("sig"))
        .selectExpr("sum(size(sig))").collect(); 0L
    }
    time("q29 full") {
      graft.operators.TextPack.minhashSig(spark, sfDir).count()
    }
    time("q30 full") {
      graft.operators.TextPack.lshPairs(spark, sfDir).count()
    }
    spark.stop()
  }
}
