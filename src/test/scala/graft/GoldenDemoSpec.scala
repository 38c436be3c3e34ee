package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{HierarchicalChunker, QualityAnalyzer}
import graft.retrieval.QueryAnalyzer

/** Golden parity with the reference's executable demo blocks (SURVEY
  * §5 / VERDICT r4 ask #10): the `__main__` demos are the reference's
  * own pinned-output documentation, so their outputs — captured from a
  * run of the reference scripts — are asserted here verbatim. Pure
  * driver-side functions, no SparkSession needed. */
class GoldenDemoSpec extends AnyFunSuite {

  // `hierarchical_chunker.py:616-642` — the demo contract, byte-for-
  // byte including the triple-quote indentation (scoring and section
  // detection both see the leading whitespace)
  private val contractText =
    """
    SERVICES AGREEMENT

    This Agreement is entered into as of January 1, 2024.

    ARTICLE 1: DEFINITIONS

    1.1 "Company" means ABC Corporation, a Delaware corporation.

    1.2 "Services" means the consulting services described in Exhibit A.

    1.3 "Term" means the period from the Effective Date until termination.

    ARTICLE 2: SCOPE OF SERVICES

    2.1 The Company shall provide Services to Client as described herein.

    2.2 Services shall be performed in a professional manner consistent
    with industry standards. The Company represents that it has the
    expertise and qualifications necessary to perform the Services.

    ARTICLE 3: COMPENSATION

    3.1 Client shall pay Company the fee of $50,000 per month.

    3.2 Payment is due within 30 days of invoice receipt.
    """.stripMargin

  test("complexity demo: the three example queries route exactly as printed") {
    // reference output (`hierarchical_chunker.py:668-676` run):
    //   'What is this contract about?' → paragraph (confidence: 0.7)
    //   'What is the exact monthly fee in Article 3?' → sentence (0.9)
    //   'Explain the scope of services' → paragraph (0.7)
    assert(QueryAnalyzer.complexity("What is this contract about?")
      == (("paragraph", 0.7)))
    assert(QueryAnalyzer.complexity("What is the exact monthly fee in Article 3?")
      == (("sentence", 0.9)))
    assert(QueryAnalyzer.complexity("Explain the scope of services")
      == (("paragraph", 0.7)))
  }

  test("chunker demo: contract hierarchy matches the LIVE reference module") {
    // The demo lives in the module the reference marks "DEPRECATED:
    // Use ChunkingService instead", and the two reference modules
    // genuinely disagree on one rule: the deprecated demo's numbered-
    // heading pattern is end-anchored (`^\d+...\s+[A-Z][^.]+$`), the
    // live `chunking_service.py:95-131` one is not. Verified by
    // running BOTH reference detectors on this text: the live one
    // finds headings at 2.1/2.2/3.1/3.2 (prefix match), the
    // deprecated one only at 2.2 (its line wraps, so no trailing
    // dot). The engine follows the LIVE module, so the golden below
    // is the live detector's section set (A1 block and the 2.2 block
    // survive the 100-char minimum; the bare ARTICLE 2/3 headings and
    // one-line 2.1/3.1/3.2 sections are sub-minimum and drop).
    val chunks = new HierarchicalChunker(paragraphSize = 300)
      .chunk(contractText, "contract_001")
    val byLevel = chunks.groupBy(_.level)
    assert(byLevel("document").map(_.id) == Seq("contract_001_doc"))

    val sections = byLevel("section").sortBy(_.chunk_index)
    assert(sections.map(_.id) == Seq("contract_001_sec_0", "contract_001_sec_1"))
    assert(sections(0).text.startsWith("ARTICLE 1: DEFINITIONS"))
    assert(sections(0).text.contains("1.3 \"Term\""))
    assert(sections(1).text.startsWith("2.2 Services shall be performed"))

    // one paragraph per section at paragraph_size=300 (the demo's
    // value), parented correctly
    val paras = byLevel("paragraph").sortBy(_.id)
    assert(paras.map(_.id) == Seq("contract_001_sec_0_para_0",
      "contract_001_sec_1_para_0"))
    assert(paras.forall(p => p.parent_id.contains(p.id.stripSuffix("_para_0"))))

    // sentence split keeps the reference's even-index quirk: the
    // boundary regex yields empty/short segments at blank lines whose
    // indices are consumed but not emitted (sent_0, sent_2, ...)
    val sents = byLevel("sentence").map(_.id).sorted
    assert(sents == Seq(
      "contract_001_sec_0_para_0_sent_0",
      "contract_001_sec_0_para_0_sent_2",
      "contract_001_sec_0_para_0_sent_4",
      "contract_001_sec_0_para_0_sent_6",
      "contract_001_sec_1_para_0_sent_0",
      "contract_001_sec_1_para_0_sent_1"), sents)
  }

  test("query-analyzer demo: all eight example queries route as printed") {
    // reference output (`query_analyzer.py:260-285` run): modality,
    // visual score, targets, exact renormalized weights, search flag
    val V = Map("bm25" -> 0.15 / 1.1, "dense" -> 0.25 / 1.1, "colpali" -> 0.7 / 1.1)
    val M = Map("bm25" -> 0.25 / 1.1, "dense" -> 0.35 / 1.1, "colpali" -> 0.5 / 1.1)
    val T = Map("bm25" -> 0.35, "dense" -> 0.55, "colpali" -> 0.1)
    val golden = Seq(
      ("What does the table show about revenue?", "visual", 1.00, Seq("table"), V, true),
      ("Summarize the contract terms", "text", 0.00, Nil, T, false),
      ("According to Figure 3, what is the trend?", "mixed", 0.30, Seq("figure"), M, true),
      ("Find the chart showing quarterly sales", "visual", 0.55, Seq("chart"), V, true),
      ("What are the termination clauses?", "text", 0.00, Nil, T, false),
      ("In the diagram on page 5", "visual", 0.55, Seq("diagram"), V, true),
      ("Show me the data table", "visual", 0.55, Seq("table"), V, true),
      ("List all parties to the agreement", "text", 0.00, Nil, T, false))
    for ((q, modality, score, targets, weights, searchVis) <- golden) {
      val a = QueryAnalyzer.analyze(q)
      assert(a.modality.name == modality, s"$q → ${a.modality}")
      assert(math.abs(a.visualScore - score) < 1e-9, s"$q → ${a.visualScore}")
      assert(a.targetElements == targets, s"$q → ${a.targetElements}")
      for ((k, w) <- weights)
        assert(math.abs(a.weights(k) - w) < 1e-9, s"$q $k → ${a.weights(k)}")
      assert(a.shouldSearchVisualElements == searchVis, q)
    }
  }

  test("table-extractor demo: the pipe table parses as printed") {
    // reference demo fixture (`table_extractor.py:610-637`)
    val sample =
      """
    Financial Summary for Q4 2023

    Table 1: Revenue by Segment

    | Segment          | Q4 2023    | Q4 2022    | Change   |
    |------------------|------------|------------|----------|
    | Software         | $2,500,000 | $2,100,000 | 19%      |
    | Services         | $1,800,000 | $1,650,000 | 9%       |
    | Hardware         | $800,000   | $950,000   | -16%     |
    | Total            | $5,100,000 | $4,700,000 | 8.5%     |

    The results show strong growth in software segment.
    """
    // Reference-run divergence, documented: the reference demo's block
    // detector latches the "Table 1: …" TITLE line into the table
    // block, so its headers become ['Table 1: Revenue by Segment'] and
    // its semantic description degrades to "Columns: Table 1: Revenue
    // by Segment … Sample row: Table 1: Revenue by Segment: Segment."
    // The engine keeps the title as the table's TITLE (the role the
    // reference's own `title` field intends) and the pipe header row
    // as the headers, so the derived semantics are the ones the
    // reference's format documentation describes rather than the
    // glitched demo print. Cell values, row set, type classification
    // and the structured-CSV shape (header kept as row 0, the
    // reference convention) match.
    val tables = graft.ingest.TableExtractor.extractTables(sample, "doc_001")
    assert(tables.size == 1)
    val t = tables.head
    assert(t.id == "doc_001_table_0")
    assert(t.tableType == "data")
    // the title line stays OUTSIDE the detected block (that exclusion
    // is exactly what keeps the headers clean), so no in-block title
    // is found — the reference demo's title-in-headers glitch and its
    // populated title field are two sides of the same block bug
    assert(t.title.isEmpty, t.title)
    assert(t.headers == Seq("Segment", "Q4 2023", "Q4 2022", "Change"))
    assert(t.numRows == 5)
    assert(t.structuredText ==
      """"Segment","Q4 2023","Q4 2022","Change"
        |"Segment","Q4 2023","Q4 2022","Change"
        |"Software","$2,500,000","$2,100,000","19%"
        |"Services","$1,800,000","$1,650,000","9%"
        |"Hardware","$800,000","$950,000","-16%"
        |"Total","$5,100,000","$4,700,000","8.5%"""".stripMargin, t.structuredText)
    assert(t.semanticDescription ==
      "This is a data table. Columns: Segment, Q4 2023, Q4 2022, Change. " +
        "Contains 4 data rows. Sample row: Segment: Software, " +
        "Q4 2023: $2,500,000, Q4 2022: $2,100,000, Change: 19%.",
      t.semanticDescription)
  }

  test("quality demo: good vs garbage documents score as printed") {
    // reference output (`document_quality.py:543-581` run):
    //   Good: Score 0.775, Tier medium, Pipeline standard
    //   Bad:  Score 0.61,  Tier medium, Pipeline standard
    // (yes — the reference's own 'bad OCR' sample lands MEDIUM, not
    // garbage; faithful parity includes that quirk)
    val goodText =
      """
    # Contract Agreement

    This Agreement is entered into as of January 1, 2024.

    ## Section 1: Definitions

    1.1 "Company" means ABC Corporation.
    1.2 "Services" means the consulting services described in Exhibit A.

    ## Section 2: Payment Terms

    The Client shall pay the Company according to the following schedule:
    - Initial payment: $10,000 upon signing
    - Monthly retainer: $5,000 per month
    """
    val badText =
      """
    Th1s ls s0me p00rly sc4nned t3xt w1th l0ts 0f 0CR err0rs
    and  m1ss1ng   characters    everywheeeeere
    aaaabbbbcccc ||||||||||| ________
    xyzqwrtp mjnbvcx asdfghjkl
    """
    val good = QualityAnalyzer.analyze(goodText)
    assert(good.overallScore == 0.775, good)
    assert(good.tier == "medium" && good.recommendedPipeline == "standard", good)
    val bad = QualityAnalyzer.analyze(badText)
    assert(bad.overallScore == 0.61, bad)
    assert(bad.tier == "medium" && bad.recommendedPipeline == "standard", bad)
  }
}
