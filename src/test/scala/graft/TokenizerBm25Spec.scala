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

  test("tokenizer kernel is byte-identical to the regex column program") {
    import graft.functions.TextFunctions.stopwords
    // the original composed program the codegen kernel replaced
    def regexTokenize(c: org.apache.spark.sql.Column) = {
      val cleaned = regexp_replace(lower(c), "[^\\w\\s]", " ")
      filter(split(cleaned, "\\s+"), t =>
        length(t) >= 2 && !array_contains(lit(stopwords.toArray), t))
    }
    val tricky = Seq("", "a I x !!!", "  leading and trailing  ",
      "naïve Café au-lait 5_5 __ok İstanbul ẞharp",
      "tabs\tand\nnewlines\r\nmix", "ALL-CAPS_WITH_123 numbers 42",
      "punct!@#$%^&*()everywhere").toDF("text")
    val docs = graft.Tables(spark, sf0001, "documents").select($"text")
      .unionByName(tricky)
    val diff = docs.select(
        TextFunctions.tokenize($"text").as("kernel"),
        regexTokenize($"text").as("regex"))
      .filter($"kernel" =!= $"regex")
    assert(diff.count() == 0, diff.take(3).mkString("\n"))
  }

  test("wsTokens and langId kernels match their regex/when column programs") {
    def wsRegex(c: org.apache.spark.sql.Column) =
      filter(split(trim(c), "\\s+"), t => length(t) > 0)
    val tricky = Seq("", "   ", "a\tb\ncd\fe\rf", " x ",
      "der die el los the and 的 是 le les", "une est dans qui — und ist nicht",
      "the quick brown fox", "el que los las y un es").toDF("text")
    val docs = graft.Tables(spark, sf0001, "documents").select($"text")
      .unionByName(tricky)
    val wsDiff = docs.select(TextFunctions.wsTokens($"text").as("k"),
        wsRegex($"text").as("r"))
      .filter($"k" =!= $"r").count()
    assert(wsDiff == 0)

    val langDiff = docs.select(
        graft.operators.TextAnalysis.langId(
          TextFunctions.wsTokens(lower($"text"))).as("k"),
        graft.operators.TextAnalysis.langIdColumnProgram(
          wsRegex(lower($"text"))).as("r"))
      .filter($"k" =!= $"r").count()
    assert(langDiff == 0)
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

  test("persisted index round-trip preserves scoring (S8 read path)") {
    val docs = corpus.toDF("id", "text")
    val q = TextFunctions.tokenizeJvm("payment terms invoice")
    val direct = BM25.score(docs, "id", "text", q, positiveOnly = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val idx = BM25.buildIndex(docs, "id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25idx").toString
    idx.postings.write.mode("overwrite").parquet(s"$tmp/postings")
    idx.idf.write.mode("overwrite").parquet(s"$tmp/idf")
    idx.stats.write.mode("overwrite").parquet(s"$tmp/stats")
    val loaded = BM25.Index(
      spark.read.parquet(s"$tmp/postings"),
      spark.read.parquet(s"$tmp/idf"),
      spark.read.parquet(s"$tmp/stats"))

    val fromIndex = BM25.scoreFromIndex(loaded, q, positiveOnly = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fromIndex.keySet == direct.keySet)
    fromIndex.foreach { case (id, s) =>
      assert(math.abs(s - direct(id)) < 1e-12, s"doc $id")
    }
  }

  test("upsertIndex == full rebuild (S8 partition-scoped maintenance)") {
    val base = corpus.toDF("id", "text")
    val idx0 = BM25.buildIndex(base, "id", "text")
    // replace doc 2 and add doc 4
    val delta = Seq(
      ("2", "Revised payment terms are net 60 days from invoice receipt"),
      ("4", "Invoice disputes must be raised within ten days"))
      .toDF("id", "text")
    val upserted = BM25.upsertIndex(idx0, delta, "id", "text")
    val rebuilt = BM25.buildIndex(
      base.filter(col("id") =!= "2").unionByName(delta), "id", "text")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(upserted.postings) == canon(rebuilt.postings))
    assert(canon(upserted.stats) == canon(rebuilt.stats))
    assert(canon(upserted.idf.select(col("term"), round(col("idf"), 9))) ==
      canon(rebuilt.idf.select(col("term"), round(col("idf"), 9))))
    val q = Seq("payment", "invoice")
    assert(canon(BM25.scoreFromIndex(upserted, q)
        .select(col("id"), round(col("score"), 9))) ==
      canon(BM25.scoreFromIndex(rebuilt, q)
        .select(col("id"), round(col("score"), 9))))

    // the invariant must survive documents that tokenize EMPTY (all
    // stopwords / 1-char tokens): they are outside the index and its
    // corpus stats by contract, identically on both paths
    val emptyDoc = Seq(("5", "the and of a I")).toDF("id", "text")
    val upserted2 = BM25.upsertIndex(upserted, emptyDoc, "id", "text")
    val rebuilt2 = BM25.buildIndex(
      base.filter(col("id") =!= "2").unionByName(delta).unionByName(emptyDoc),
      "id", "text")
    assert(canon(upserted2.stats) == canon(rebuilt2.stats))
    assert(canon(upserted2.postings) == canon(rebuilt2.postings))
  }

  test("Porter stemmer matches the published algorithm's examples") {
    import graft.functions.PorterStemmer.stem
    // pairs from Porter (1980) §§2-6 worked examples
    val pins = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "sized" -> "size", "hopping" -> "hop", "falling" -> "fall",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      // per-step paper example is electrical→electric; the full
      // pipeline then strips -ic at m>1 (step 4), as NLTK also does
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good", "formative" -> "form",
      "adjustable" -> "adjust", "replacement" -> "replac",
      "adoption" -> "adopt", "controll" -> "control", "roll" -> "roll")
    pins.foreach { case (in, out) => assert(stem(in) == out, s"stem($in)") }
    // length <= 2 passes through
    assert(stem("is") == "is" && stem("a") == "a")
  }

  test("stemming tokenizer: column, JVM and codegen agree; default off") {
    val text = "the ponies were hopping happily over electrical fences"
    val expected = TextFunctions.tokenizeJvm(text, stem = true)
    val df = Seq(Tuple1(text)).toDF("text")
    val got = df.select(TextFunctions.tokenize($"text", stem = true)).head().getSeq[String](0)
    assert(got == expected)
    assert(expected.contains("poni") && expected.contains("hop") &&
      expected.contains("electr"))
    // stem = false is byte-identical to the plain tokenizer
    assert(TextFunctions.tokenizeJvm(text, stem = false) == TextFunctions.tokenizeJvm(text))
  }

  test("scoreFromIndex scans only the query terms' posting lists") {
    val docs = corpus.toDF("id", "text")
    val idx = BM25.buildIndex(docs, "id", "text")
    val plan = BM25.scoreFromIndex(idx, Seq("payment", "invoice"))
      .queryExecution.executedPlan.toString
    // the term IN (...) predicate must sit on the postings side, not be
    // applied after a full join
    assert(plan.contains("payment") && plan.contains("invoice"))
  }
}
