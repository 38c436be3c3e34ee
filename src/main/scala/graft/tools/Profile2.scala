package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup

/** Ad-hoc stage profiler for the q32/q34 hot paths (diagnostics only). */
object Profile2 {
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
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val PerturbOffset = 1000000L
    val dc = {
      val toks = docs.select($"doc_id", $"source", TextFunctions.tokenize($"text").as("toks"))
      toks.unionByName(
        toks.filter($"doc_id" % 7 === 0 && size($"toks") >= 5)
          .select(($"doc_id" + PerturbOffset).as("doc_id"), $"source",
            slice($"toks", lit(1), greatest(size($"toks") - 2, lit(0))).as("toks")))
    }

    val sim32 = Dedup.simhashTable(dc, "doc_id", "toks")
    time("simhash32 table")(sim32.count())
    val cached32 = sim32.cache(); cached32.count()
    time("hamming pairs 32-bit blocks") {
      Dedup.hammingPairs(cached32, 6).count()
    }
    // bucket skew for 32-bit layout
    val blocks = Dedup.pigeonholeBlocks(32, 6)
    val blocked = cached32.select($"id", $"simhash",
      posexplode(array(blocks.map { case (off, w) =>
        shiftright($"simhash", off).bitwiseAND(lit((1L << w) - 1)) }: _*))
        .as(Seq("blk", "blk_val")))
    blocked.groupBy($"blk", $"blk_val").count()
      .orderBy($"count".desc).show(10)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val e = emb.select($"vec_id", $"embedding")
      .unionByName(emb.filter($"vec_id" % 11 === 0)
        .select(($"vec_id" + PerturbOffset).as("vec_id"), $"embedding"))
    time("q34 signatures") {
      e.select($"vec_id",
        VectorFunctions.hyperplaneBuckets($"embedding".cast("array<double>"), 4, 6).as("sig"))
        .count()
    }
    time("q34 cosinePairsLsh full") {
      Dedup.cosinePairsLsh(e, "vec_id", "embedding", 0.95).count()
    }
    val sig = e.select($"vec_id".as("id"),
        posexplode(VectorFunctions.hyperplaneBuckets($"embedding".cast("array<double>"), 4, 6))
          .as(Seq("tbl", "bucket")))
      .cache()
    sig.count()
    time("q34 candidate pairs (no verify)") {
      sig.as("a").join(sig.as("b"),
        $"a.tbl" === $"b.tbl" && $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id").count()
    }
    sig.groupBy($"tbl", $"bucket").count().orderBy($"count".desc).show(5)
    spark.stop()
  }
}
