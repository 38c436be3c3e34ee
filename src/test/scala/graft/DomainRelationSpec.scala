package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{DomainMetadata, RelationshipExtractor, StructureDetector}

/** Pins I7 metadata extraction (FIXTURES B2, `domain_schemas.py:767-786`)
  * and I8 relationship extraction (FIXTURES B5,
  * `document_graph.py:606-662`). */
class DomainRelationSpec extends AnyFunSuite {

  val servicesAgreement =
    """SERVICES AGREEMENT
      |
      |This Agreement is entered into as of January 1, 2024.
      |
      |ARTICLE 1: DEFINITIONS
      |1.1 "Company" means ABC Corporation, a Delaware corporation.
      |1.2 "Services" means the consulting services described in Exhibit A.
      |1.3 "Term" means the period from the Effective Date until termination.
      |
      |ARTICLE 2: SCOPE OF SERVICES
      |2.1 The Company shall provide Services to Client as described herein.
      |2.2 Services shall be performed in a professional manner.
      |
      |ARTICLE 3: COMPENSATION
      |3.1 Client shall pay Company the fee of $50,000 per month.
      |3.2 Payment is due within 30 days of invoice receipt.""".stripMargin

  test("contract extraction: type, monetary, terms (B2)") {
    val m = DomainMetadata.extract(servicesAgreement)
    assert(m.documentType == "contract")
    assert(m.documentSubtype == "service_agreement")
    assert(m.filterTags("contract_type") == "service_agreement")
    assert(m.filterTags("monetary_values").contains("50000"))
    assert(m.keyTerms.contains("termination"))
    assert(m.filterTags("has_termination_clause") == "true")
    assert(m.title.contains("SERVICES AGREEMENT"))
  }

  test("party extraction on the reference's own demo text (domain_schemas.py:767-786)") {
    val demoText =
      """SERVICES AGREEMENT
        |
        |This Agreement is entered into as of January 1, 2024 between
        |ABC Corporation ("Company") and XYZ Consulting LLC ("Consultant").
        |
        |WHEREAS, Company desires to engage Consultant...
        |
        |The governing law shall be the State of Delaware.""".stripMargin
    val m = DomainMetadata.extract(demoText)
    // faithful reference quirk: greedy class + suffix alternation yields
    // "ABC Corp", not "ABC Corporation" (same in CPython re and Java)
    assert(m.parties.contains("ABC Corp"))
    // faithful reference quirk: the governing-law regex captures the two
    // words after "governing law", here "shall be" (not "Delaware")
    assert(m.filterTags("governing_law") == "shall be")
  }

  test("structure detection finds the 3 ARTICLE sections (B2/I3)") {
    val sections = StructureDetector.detect(servicesAgreement, "legal")
    val articles = sections.filter(_.title.startsWith("ARTICLE"))
    assert(articles.length == 3)
    assert(articles.map(_.number.get) == Seq("1", "2", "3"))
  }

  test("tax extractor pulls IRC sections and categories") {
    val m = DomainMetadata.extractTax(
      "Under IRC Section 199A, the qualified business income deduction applies. See Form 8995. Income tax rules govern.")
    assert(m.filterTags("irc_sections").contains("199A".take(3)))
    assert(m.filterTags("tax_forms").contains("8995"))
    assert(m.keyTerms.contains("income_tax") || m.keyTerms.contains("deductions"))
  }

  val amendmentText =
    """FIRST AMENDMENT TO MASTER SERVICES AGREEMENT
      |
      |This First Amendment amends the Master Services Agreement dated January 1, 2024
      |between ABC Corp and XYZ Inc.
      |
      |Pursuant to Section 15.2 of the original agreement, the parties hereby agree
      |to modify the payment terms as set forth in Exhibit A attached hereto.
      |
      |This Amendment incorporates by reference all terms of the original MSA
      |except as specifically modified herein.
      |
      |This Amendment shall be governed by IRC Section 7701 for tax purposes.""".stripMargin

  test("relationship extraction finds the B5 edge types") {
    val rels = RelationshipExtractor.extract(amendmentText, "amendment_001")
    val types = rels.map(_.relation_type).toSet
    assert(types.contains("amends"))
    assert(types.contains("references"))
    assert(types.contains("exhibits_to"))
    assert(types.contains("incorporates"))
    assert(types.contains("cites"))
    // cites/exhibits carry 0.9 base confidence (document_graph.py:192-194)
    assert(rels.filter(_.relation_type == "cites").forall(_.confidence >= 0.8))
    // all confidences clamped [0.3, 1.0]
    assert(rels.forall(r => r.confidence >= 0.3 && r.confidence <= 1.0))
  }

  test("two-pass resolution binds unresolved refs to registered ids (B5)") {
    val rels = RelationshipExtractor.extract(amendmentText, "amendment_001")
    val resolved = RelationshipExtractor.resolve(rels, Seq(
      "MSA-2024-001" -> "contract_001",
      "Master Services Agreement dated January 1, 2024" -> "contract_001"))
    assert(resolved.exists(r =>
      r.relation_type == "amends" && r.target_id == "contract_001"))
    // unresolvable refs keep the unresolved: prefix
    assert(resolved.exists(_.target_id.startsWith("unresolved:")))
  }

  test("dedup is first-writer-wins by (source, target, type)") {
    val rels = RelationshipExtractor.extract(
      "amends the Agreement dated 2024. amends the Agreement dated 2024.", "d")
    val keys = rels.map(r => (r.source_id, r.target_id, r.relation_type))
    assert(keys.distinct.length == keys.length)
  }
}
