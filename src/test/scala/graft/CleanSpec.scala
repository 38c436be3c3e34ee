package graft

import org.apache.spark.sql.functions._

import graft.operators.Clean

/** Hand-value checks for the C4-style line cleaner and the
  * cross-document keep-first line dedup. */
class CleanSpec extends SparkSpec {

  test("lineClean applies the C4 keep rules row-locally") {
    import spark.implicits._
    val doc = Seq((1L, Seq(
      "This line has enough words and ends properly.",
      "lorem ipsum filler that would otherwise pass the other rules.",
      "no terminal punctuation on this line",
      "Too short.",
      "function() { return 1; } // code-looking line.",
      "Quoted endings are accepted as terminal punctuation?\"").mkString("\n")))
      .toDF("id", "text")
    val r = Clean.lineClean(doc, "id", "text").head()
    assert(r.getAs[Long]("n_lines") == 6)
    assert(r.getAs[Long]("n_kept") == 2)
    val cleaned = r.getAs[String]("cleaned")
    assert(cleaned.startsWith("This line has enough words"))
    assert(cleaned.endsWith("punctuation?\""))
  }

  test("dedupRepeatedLines keeps only the first occurrence, empty docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha unique one.\nShared footer line."),
      (2L, "beta unique two.\nShared footer line."),
      (3L, "Shared footer line.")).toDF("id", "text")
    val out = Clean.dedupRepeatedLines(docs, "id", "text")
      .orderBy($"id").collect()
    // doc 1 wins the shared line (min (id, pos)); docs 2 and 3 lose it
    assert(out(0).getAs[Long]("n_kept") == 2)
    assert(out(1).getAs[Long]("n_kept") == 1)
    assert(out(1).getAs[String]("cleaned") == "beta unique two.")
    // doc 3 had ONLY the shared line: still present, empty
    assert(out(2).getAs[Long]("n_kept") == 0)
    assert(out(2).getAs[String]("cleaned") == "")
  }

  test("dedup preserves original line order within a doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "z last word line.\na first word line.\nm middle line."),
      (2L, "completely different content.")).toDF("id", "text")
    val r = Clean.dedupRepeatedLines(docs, "id", "text")
      .filter($"id" === 1L).head()
    assert(r.getAs[String]("cleaned") ==
      "z last word line.\na first word line.\nm middle line.")
  }

  test("gate queries are nonempty and self-consistent at sf0.001") {
    val lc = Clean.lineCleanGate(spark, sf0001)
    assert(lc.count() > 0)
    assert(lc.filter(col("n_kept") > col("n_lines")).isEmpty)
    val dd = Clean.dedupLinesGate(spark, sf0001)
    assert(dd.count() > 0)
    // exactly one doc keeps the global boilerplate footer
    assert(dd.filter(col("n_kept") === 3).count() == 1)
  }

  test("span scrub removes shared windows, keeps unique prose, respects minDocs") {
    import spark.implicits._
    // 3 docs share a 4-token header; each has unique prose; 2 docs
    // (below minDocs=3) share a 4-token footer that must SURVIVE
    val header = "common license header tokens"
    val footer = "shared pair footer tokens"
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta $footer"),
      (2L, s"$header epsilon zeta eta theta $footer"),
      (3L, s"$header iota kappa lambda mu unique")).toDF("id", "text")
    val out = Clean.scrubRepeatedSpans(docs, "id", "text", w = 4, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the header's single fully-shared window covers its 4 tokens in
    // every doc; windows bridging into unique prose have df 1
    assert(out(1L) == ((12L, 4L, s"alpha beta gamma delta $footer")), out(1L))
    assert(out(2L) == ((12L, 4L, s"epsilon zeta eta theta $footer")), out(2L))
    assert(out(3L) == ((9L, 4L, "iota kappa lambda mu unique")), out(3L))

    // lowering minDocs to 2 scrubs the pair-shared footer too
    val strict = Clean.scrubRepeatedSpans(docs, "id", "text", w = 4, minDocs = 2)
      .filter($"id" === 1L).head()
    assert(strict.getString(3) == "alpha beta gamma delta", strict.getString(3))

    // a doc shorter than the window passes through untouched
    val short = Clean.scrubRepeatedSpans(
      Seq((9L, "only three tokens")).toDF("id", "text"), "id", "text",
      w = 4, minDocs = 2).head()
    assert(short.getLong(1) == 3L && short.getLong(2) == 0L &&
      short.getString(3) == "only three tokens")
  }
  test("normalizeText: NFC composes, control/CRLF/space noise collapses") {
    import spark.implicits._
    val cases = Seq(
      (1L, "Cafe\u0301"),                      // decomposed -> composed
      (2L, "a\r\nb\rc"),                     // CRLF and bare CR -> LF
      (3L, "x\u0007y\u0000z"),                // control chars stripped
      (4L, "a \t b   c"),                      // tab/space runs -> one space
      (5L, "  line \n  next  \n"),            // spaces around newlines + ends
      (6L, "already clean")
    ).toDF("id", "text")
    val out = cases
      .select($"id", graft.functions.TextFunctions.normalizeText($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Caf\u00e9")
    assert(out(2L) == "a\nb\nc")
    assert(out(3L) == "xyz")
    assert(out(4L) == "a b c")
    assert(out(5L) == "line\nnext")
    assert(out(6L) == "already clean")
  }
}
