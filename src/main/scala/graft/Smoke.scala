package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Diagnostic smoke main: exercises the custom Catalyst kernels and the
  * flagship entry through the public API. Usage: runMain graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions()(_))
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    df.select(dot($"a", $"b").as("dot"), cosine($"a", $"b").as("cos")).show()

    val m = Seq((Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(Seq(2.0, 0.0), Seq(0.0, 3.0))))
      .toDF("q", "p")
    m.select(maxsim($"q", $"p").as("maxsim")).show()

    val e = Seq((Seq(Seq(1.0, 0.0)), Seq.empty[Seq[Double]])).toDF("q", "p")
    e.select(maxsim($"q", $"p").as("maxsim_empty")).show()

    val nl = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    nl.select(dot($"a", $"b").as("dot_null")).show()

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding")
      .collect()(0).getSeq[Float](0).toArray
    val scored = emb.select($"vec_id", dot($"embedding", lit(q0)).as("score"))
      .orderBy($"score".desc, $"vec_id").limit(5)
    scored.show()
    scored.explain("formatted")

    val entry = SparkEntry.entry(spark)
    entry.show(10, 80)
    println("entry rows: " + entry.count())

    // probes: tenant isolation + degenerate queries through the facade
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text", $"source")
    val bundle = graft.ingest.Pipeline.ingest(docs, orgCol = Some("source"))
    val other = graft.retrieval.HybridSearch.search(
      bundle.chunks, "spark join filter", graft.model.TenantContext("src7"),
      cfg = graft.retrieval.HybridSearch.Config(limit = 5))
    val leaked = other.join(
      bundle.chunks.filter($"organization_id" =!= "src7").select($"id"), Seq("id"))
    println("cross-tenant leaked rows: " + leaked.count())
    val stopOnly = graft.retrieval.HybridSearch.search(
      bundle.chunks, "the and of is", graft.model.TenantContext("src7"),
      cfg = graft.retrieval.HybridSearch.Config(limit = 5))
    println("stopword-only-query rows: " + stopOnly.count())
    val noHit = graft.retrieval.HybridSearch.search(
      bundle.chunks, "zzzxqwv unknownterm", graft.model.TenantContext("src7"),
      cfg = graft.retrieval.HybridSearch.Config(limit = 5))
    println("oov-query rows: " + noHit.count())

    // table extraction + rerank through the library surface
    val tableDoc = "Report\n\n| item | price | qty |\n|---|---|---|\n| bolt | $5 | 100 |\n| nut | $2 | 250 |\n| screw | $3 | 75 |"
    val tables = graft.ingest.TableExtractor.extractTables(tableDoc, "smoke_doc")
    println(s"tables found: ${tables.length}; type=${tables.headOption.map(_.tableType)}")
    tables.foreach(t => println("semantic: " + t.semanticDescription))
    val reranked = graft.retrieval.Rerank.rerank(
      bundle.chunks.filter($"level" === "paragraph").select($"id", $"text"),
      "spark join filter window", 3)
    reranked.show(3, 60)
    spark.stop()
  }
}
