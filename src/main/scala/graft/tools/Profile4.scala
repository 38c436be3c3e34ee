package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{EmbedFunctions, TextFunctions}
import graft.model.{Filters, TenantContext}
import graft.operators.RetrievalPack
import graft.retrieval.HybridSearch

/** q49 phase profile (diagnostics only). */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    def chunks = spark.read.parquet(s"$sfDir/documents.parquet").select(
      lpad($"doc_id".cast("string"), 6, "0").as("id"),
      $"text", $"lang",
      $"source".as("organization_id"),
      lit("internal").as("access_level"),
      EmbedFunctions.featureHashEmbed(
        transform(TextFunctions.tokenize($"text"),
          t => TextFunctions.hash56(t)), 64).as("embedding"))

    val ctx = TenantContext("src3")
    val q = RetrievalPack.FallbackQuery

    time("full q49 gate") {
      RetrievalPack.enhancedFallback(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("base search (empty scope) only") {
      HybridSearch.search(chunks, q, ctx,
        Map("lang" -> Filters.Eq("zz")),
        HybridSearch.Config(limit = 10, levelFilter = None))
        .write.format("noop").mode("overwrite").save()
    }
    time("filterless retry search only") {
      HybridSearch.search(chunks, q, ctx, Map.empty,
        HybridSearch.Config(limit = 5, levelFilter = None))
        .write.format("noop").mode("overwrite").save()
    }
    time("full q49 gate (warm)") {
      RetrievalPack.enhancedFallback(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
