package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.retrieval.QueryAnalyzer

/** Pins V6/V7/V8 + classification behavior on the reference's demo
  * queries (FIXTURES B7, `query_analyzer.py:260-269`,
  * `enhanced_hybrid_search.py:369-389`). */
class QueryAnalyzerSpec extends AnyFunSuite {

  test("modality routing: visual queries boost colpali") {
    val a = QueryAnalyzer.analyze("What does the table show about revenue?")
    assert(a.modality == QueryAnalyzer.Visual)
    assert(a.weights("colpali") > a.weights("bm25"))
    assert(a.targetElements.contains("table"))
    assert(a.shouldSearchVisualElements)
  }

  test("modality routing: text queries keep dense-heavy weights") {
    val a = QueryAnalyzer.analyze("Summarize the contract terms")
    assert(a.modality == QueryAnalyzer.Text)
    assert(a.weights == QueryAnalyzer.defaultWeights("text"))
    assert(!a.shouldSearchVisualElements)
  }

  test("element-target boost renormalizes weights to 1") {
    val a = QueryAnalyzer.analyze("Find the chart showing revenue trends")
    assert(a.targetElements.contains("chart"))
    assert(math.abs(a.weights.values.sum - 1.0) < 1e-9)
  }

  test("classification follows reference priority order") {
    assert(QueryAnalyzer.classify("compare revenue vs expenses") == "comparative")
    assert(QueryAnalyzer.classify("when does the term end") == "temporal")
    assert(QueryAnalyzer.classify("what is in Table 3") == "reference")
    assert(QueryAnalyzer.classify("what is the exact amount") == "precise")
    assert(QueryAnalyzer.classify("tell me everything") == "broad")
  }

  test("precision detection extracts references") {
    assert(QueryAnalyzer.detectPrecision("the value in Table 3") ==
      ((true, Some("table_reference"), Some("3"))))
    assert(QueryAnalyzer.detectPrecision("see Section 5.2 for details") ==
      ((true, Some("section_reference"), Some("5.2"))))
    assert(QueryAnalyzer.detectPrecision("a broad question")._1 == false)
    assert(QueryAnalyzer.precisionSearchTerms("table_reference", "3") ==
      Seq("Table 3", "table 3"))
  }

  test("complexity maps precision/broad keywords to levels") {
    assert(QueryAnalyzer.complexity("What is the exact value in Table 3?") ==
      (("sentence", 0.9)))
    assert(QueryAnalyzer.complexity("Give me an overview and summary") ==
      (("section", 0.9)))
    assert(QueryAnalyzer.complexity("payment schedule")._1 == "paragraph")
  }
}
