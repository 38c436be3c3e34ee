package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.QualityAnalyzer
import graft.retrieval.Acronyms

/** Pins V11 disambiguation (`acronym_database.py:628-652`) and I2
  * quality tiers (`document_quality.py:544-581`, FIXTURES B6/B7). */
class AcronymQualitySpec extends AnyFunSuite {

  test("IRC disambiguates by context: tax vs building") {
    val tax = Acronyms.lookup("IRC",
      context = Some("IRC Section 199A qualified business income tax deduction"))
    assert(tax.exists(_.expansion == "Internal Revenue Code"))

    val building = Acronyms.lookup("IRC",
      context = Some("Does the IRC require smoke detectors in residential dwelling units home"))
    assert(building.exists(_.expansion == "International Residential Code"))
  }

  test("domain hint overrides context") {
    val t = Acronyms.lookup("IRC", context = Some("residential dwelling"),
      domainHint = Some("tax"))
    assert(t.exists(_.expansion == "Internal Revenue Code"))
  }

  test("query expansion rewrites acronym in place") {
    val (expanded, exps) = Acronyms.expandQuery("MSA payment terms")
    assert(expanded == "MSA (Master Services Agreement) payment terms")
    assert(exps == Seq("MSA → Master Services Agreement"))
  }

  test("domain detection from keywords") {
    assert(Acronyms.detectDomain("this agreement between the parties hereby") == "legal")
    assert(Acronyms.detectDomain("quarterly earnings revenue fiscal investor") == "financial")
    assert(Acronyms.detectDomain("zzz qqq") == "general")
  }

  test("quality tiers: clean contract vs OCR garbage (B6)") {
    val good =
      """# Contract Agreement
        |
        |This Agreement is entered into as of January 1, 2024.
        |
        |## Section 1: Definitions
        |
        |1.1 "Company" means ABC Corporation.
        |1.2 "Services" means the consulting services described in Exhibit A.
        |
        |## Section 2: Payment Terms
        |
        |The Client shall pay the Company according to the following schedule:
        |- Initial payment: $10,000 upon signing
        |- Monthly retainer: $5,000 per month""".stripMargin
    val bad =
      """Th1s ls s0me p00rly sc4nned t3xt w1th l0ts 0f 0CR err0rs
        |and  m1ss1ng   characters    everywheeeeere
        |aaaabbbbcccc ||||||||||| ________
        |xyzqwrtp mjnbvcx asdfghjkl""".stripMargin

    val goodReport = QualityAnalyzer.analyze(good)
    val badReport = QualityAnalyzer.analyze(bad)
    assert(Seq("high", "medium").contains(goodReport.tier))
    assert(Seq("hierarchical", "standard").contains(goodReport.recommendedPipeline))
    // the reference's own scoring is lenient on this short sample (OCR
    // penalties cap out around "medium"); pin the ordering + sub-scores
    assert(goodReport.overallScore > badReport.overallScore)
    assert(badReport.tier != "high")
    assert(badReport.ocrScore < goodReport.ocrScore)
    assert(badReport.structureScore < goodReport.structureScore)
  }

  test("near-empty text short-circuits to garbage/manual") {
    val r = QualityAnalyzer.analyze("too short")
    assert(r.tier == "garbage" && r.recommendedPipeline == "manual")
    assert(r.chunkStrategy == "token")
  }

  test("quality→strategy map matches chunking_service.py:64-69") {
    assert(QualityAnalyzer.strategyMap == Map(
      "high" -> "sdpm", "medium" -> "semantic",
      "low" -> "sentence", "garbage" -> "token"))
  }

  test("seed dim parity with init.sql:468-494 (count + spot rows)") {
    // 19 seeded rows: 4 tax + 5 building + 5 legal + 5 financial
    assert(Acronyms.seedTerms.size == 19)
    assert(Acronyms.seedTerms.map(_.domain).groupBy(identity).view
      .mapValues(_.size).toMap ==
      Map("tax" -> 4, "building" -> 5, "legal" -> 5, "financial" -> 5))
    // exactly one ambiguous acronym (IRC), two expansions
    assert(Acronyms.seedTerms.groupBy(_.term).filter(_._2.size > 1).keySet
      == Set("IRC"))
    // spot rows pin (acronym, expansion, domain, priority) tuples
    val rows = Acronyms.seedTerms
      .map(t => (t.term, t.expansion, t.domain, t.priority)).toSet
    assert(rows.contains(("IRC", "Internal Revenue Code", "tax", 90)))
    assert(rows.contains(("IRC", "International Residential Code", "building", 90)))
    assert(rows.contains(("FUTA", "Federal Unemployment Tax Act", "tax", 70)))
    assert(rows.contains(("EBITDA",
      "Earnings Before Interest, Taxes, Depreciation, and Amortization",
      "financial", 85)))
    assert(rows.contains(("QOQ", "Quarter over Quarter", "financial", 70)))
    // every row carries non-empty disambiguation context
    assert(Acronyms.seedTerms.forall(_.contextKeywords.nonEmpty))
  }
}
