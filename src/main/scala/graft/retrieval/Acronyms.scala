package graft.retrieval

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Acronym/terminology database with context disambiguation (V11,
  * reference `src/terminology/acronym_database.py` + seed rows
  * `init.sql:468-494`). The flagship ambiguity is IRC: Internal Revenue
  * Code (tax) vs International Residential Code (building), resolved by
  * context-keyword scoring (`acronym_database.py:436-453`).
  *
  * Driver-side lookup map + broadcast-able DataFrame (J11) for
  * token-level joins.
  */
object Acronyms {

  case class Term(
      term: String,
      expansion: String,
      domain: String,
      priority: Int,
      contextKeywords: Seq[String])

  /** Seed terms: `init.sql:468-494` with context keywords from
    * `acronym_database.py:100-380`. */
  val seedTerms: Seq[Term] = Seq(
    Term("IRC", "Internal Revenue Code", "tax", 90,
      Seq("tax", "federal", "revenue", "section")),
    Term("IRS", "Internal Revenue Service", "tax", 90,
      Seq("tax", "audit", "filing", "return")),
    Term("FICA", "Federal Insurance Contributions Act", "tax", 80,
      Seq("payroll", "social security", "medicare")),
    Term("FUTA", "Federal Unemployment Tax Act", "tax", 70,
      Seq("unemployment", "payroll")),
    Term("IRC", "International Residential Code", "building", 90,
      Seq("residential", "dwelling", "house", "home")),
    Term("IBC", "International Building Code", "building", 90,
      Seq("building", "commercial", "construction", "occupancy")),
    Term("IFC", "International Fire Code", "building", 80,
      Seq("fire", "safety", "sprinkler")),
    Term("IMC", "International Mechanical Code", "building", 70,
      Seq("hvac", "mechanical", "ventilation")),
    Term("IPC", "International Plumbing Code", "building", 70,
      Seq("plumbing", "fixture", "drainage")),
    Term("LLC", "Limited Liability Company", "legal", 90,
      Seq("company", "entity", "member")),
    Term("NDA", "Non-Disclosure Agreement", "legal", 85,
      Seq("confidential", "proprietary", "secret")),
    Term("MSA", "Master Services Agreement", "legal", 80,
      Seq("services", "master", "umbrella")),
    Term("SOW", "Statement of Work", "legal", 75,
      Seq("scope", "deliverables", "services")),
    Term("IP", "Intellectual Property", "legal", 85,
      Seq("patent", "trademark", "copyright")),
    Term("GAAP", "Generally Accepted Accounting Principles", "financial", 90,
      Seq("accounting", "audit", "standards")),
    Term("EBITDA", "Earnings Before Interest, Taxes, Depreciation, and Amortization",
      "financial", 85, Seq("earnings", "profitability", "margin")),
    Term("ROI", "Return on Investment", "financial", 80,
      Seq("investment", "return", "yield")),
    Term("YOY", "Year over Year", "financial", 75,
      Seq("annual", "growth", "comparison")),
    Term("QOQ", "Quarter over Quarter", "financial", 70,
      Seq("quarterly", "growth", "comparison")))

  private val byTerm: Map[String, Seq[Term]] = seedTerms.groupBy(_.term.toUpperCase)

  /** `acronym_database.py:497-525`: domain keyword boost lists. */
  private val domainKeywords: Map[String, Seq[String]] = Map(
    "legal" -> Seq("agreement", "contract", "party", "whereas", "hereby"),
    "tax" -> Seq("tax", "irs", "deduction", "income", "filing"),
    "building" -> Seq("code", "construction", "building", "occupancy", "fire"),
    "financial" -> Seq("revenue", "earnings", "quarter", "fiscal", "investor"))

  private val acronymPattern = Pattern.compile("""\b([A-Z]{2,6})\b""")

  /** Context-aware lookup (`acronym_database.py:403-453`): domain hint
    * wins; else context-keyword-hit argmax; else first definition. */
  def lookup(term: String, context: Option[String] = None,
             domainHint: Option[String] = None): Option[Term] = {
    val defs = byTerm.getOrElse(term.toUpperCase, return None)
    if (defs.size == 1) return defs.headOption
    domainHint.flatMap(d => defs.find(_.domain == d)).orElse {
      context match {
        case Some(ctx) =>
          val lower = ctx.toLowerCase
          // strictly-greater beats, ties keep earlier (reference iterates
          // in insertion order keeping best_score > comparisons)
          var best = defs.head
          var bestScore = 0
          for (d <- defs) {
            val s = d.contextKeywords.count(lower.contains)
            if (s > bestScore) { bestScore = s; best = d }
          }
          Some(best)
        case None => defs.headOption
      }
    }
  }

  /** Query expansion (`acronym_database.py:455-486`): rewrite "IRC" →
    * "IRC (Internal Revenue Code)"; returns (expanded, expansions). */
  def expandQuery(query: String, domainHint: Option[String] = None): (String, Seq[String]) = {
    var expanded = query
    val expansions = Seq.newBuilder[String]
    val m = acronymPattern.matcher(query)
    while (m.find()) {
      val acro = m.group(1)
      lookup(acro, context = Some(query), domainHint = domainHint).foreach { d =>
        expanded = expanded.replaceFirst(Pattern.quote(acro),
          java.util.regex.Matcher.quoteReplacement(s"$acro (${d.expansion})"))
        expansions += s"$acro → ${d.expansion}"
      }
    }
    (expanded, expansions.result())
  }

  /** Domain detection (`acronym_database.py:499-525`): term hits +
    * keyword hits, argmax; 0 hits ⇒ general. */
  def detectDomain(text: String): String = {
    val lower = text.toLowerCase
    val domains = Seq("legal", "tax", "building", "financial")
    val scores = domains.map { d =>
      val termHits = seedTerms.filter(_.domain == d)
        .count(t => lower.contains(t.term.toLowerCase))
      val kwHits = domainKeywords(d).count(lower.contains)
      d -> (termHits + kwHits)
    }
    val (best, score) = scores.maxBy(_._2)
    if (score > 0) best else "general"
  }

  /** The acronym dim table as a broadcast-able DataFrame (J11). */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    seedTerms.map(t => (t.term, t.expansion, t.domain, t.priority))
      .toDF("acronym", "expansion", "domain", "priority")
  }
}
