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
