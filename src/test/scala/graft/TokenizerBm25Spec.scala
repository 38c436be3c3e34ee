package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.BM25

/** Pins the reference's BM25 demo (FIXTURES B3, `bm25_store.py:480-506`):
  * 3-doc corpus, query "payment terms invoice" → top hit id "2". */
class TokenizerBm25Spec extends SparkSpec {
  import spark.implicits._

  val corpus = Seq(
    ("1", "This contract is between Party A and Party B"),
    ("2", "Payment terms are net 30 days from invoice date"),
    ("3", "The agreement shall commence on January 1, 2024"))

  test("tokenizer matches reference TextPreprocessor semantics") {
    // stopwords removed, len>=2, lowercase, punctuation stripped
    assert(TextFunctions.tokenizeJvm("Payment terms are net 30 days from invoice date") ==
      Seq("payment", "terms", "net", "30", "days", "invoice", "date"))
    assert(TextFunctions.tokenizeJvm("The agreement shall commence on January 1, 2024") ==
      Seq("agreement", "commence", "january", "2024"))
    assert(TextFunctions.tokenizeJvm("") == Seq.empty)
    assert(TextFunctions.tokenizeJvm("a I x !!!") == Seq.empty)
  }

  test("column tokenizer agrees with JVM tokenizer") {
    val df = corpus.toDF("id", "text")
    val got = df.select($"id", TextFunctions.tokenize($"text").as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    corpus.foreach { case (id, text) =>
      assert(got(id) == TextFunctions.tokenizeJvm(text), s"doc $id")
    }
  }

  test("BM25 demo: 'payment terms invoice' ranks doc 2 first") {
    val docs = corpus.toDF("id", "text")
    val top = BM25.search(docs, "id", "text",
      TextFunctions.tokenizeJvm("payment terms invoice"), 10)
      .collect()
    assert(top.nonEmpty)
    assert(top.head.getString(0) == "2")
    assert(top.head.getDouble(1) > 0)
    // only doc 2 contains any query term with positive idf
    assert(top.forall(_.getDouble(1) > 0))
  }

  test("BM25 score non-negativity under positiveOnly (F8)") {
    val docs = corpus.toDF("id", "text")
    val scores = BM25.score(docs, "id", "text", Seq("contract", "payment"))
      .collect().map(_.getDouble(1))
    assert(scores.forall(_ > 0))
  }
}
