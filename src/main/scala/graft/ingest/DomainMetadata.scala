package graft.ingest

import java.util.regex.Pattern

/** Domain metadata extraction (I7, reference
  * `src/metadata/domain_schemas.py:57-740`): keyword/regex-based (never
  * model-based) extraction routed by document type, emitting variable
  * `filter_tags` maps that compile to map-column filters at query time
  * (SURVEY §1.2 schema regime). Four extractors: contract, IRC/tax,
  * building code, financial report.
  */
object DomainMetadata {

  case class Extracted(
      documentType: String,
      documentSubtype: String,
      confidence: Double,
      title: Option[String],
      parties: Seq[String],
      keyTerms: Seq[String],
      references: Seq[String],
      filterTags: Map[String, String])

  // ---- contract extractor (`domain_schemas.py:89-287`) -------------------

  /** `domain_schemas.py:97-133`. */
  val contractTypeKeywords: Map[String, Seq[String]] = Map(
    "service_agreement" -> Seq("services agreement", "consulting agreement",
      "service contract", "professional services", "master services"),
    "employment" -> Seq("employment agreement", "employment contract",
      "offer letter", "at-will employment", "separation agreement"),
    "nda" -> Seq("non-disclosure", "confidentiality agreement", "nda",
      "confidential information", "proprietary information"),
    "lease" -> Seq("lease agreement", "rental agreement", "lease contract",
      "landlord", "tenant", "premises"),
    "license" -> Seq("license agreement", "software license",
      "intellectual property", "licensor", "licensee", "royalty"),
    "purchase" -> Seq("purchase agreement", "sale agreement",
      "asset purchase", "stock purchase", "acquisition agreement"),
    "partnership" -> Seq("partnership agreement", "joint venture",
      "operating agreement", "llc agreement", "shareholder agreement"),
    "amendment" -> Seq("amendment", "addendum", "modification", "supplement to"),
    "settlement" -> Seq("settlement agreement", "release", "mutual release",
      "dispute resolution"))

  /** `domain_schemas.py:136-141`. */
  val legalTerms: Seq[String] = Seq(
    "indemnification", "liability", "termination", "breach",
    "force majeure", "governing law", "jurisdiction", "arbitration",
    "confidentiality", "non-compete", "warranty", "representation",
    "assignment", "waiver", "notice", "amendment")

  private val partyPatterns = Seq(
    """between\s+([A-Z][A-Za-z\s,\.]+(?:LLC|Inc|Corp|Corporation|Company|Ltd))""",
    """"([A-Z][A-Za-z\s]+)"\s*\(""",
    """(?:Party|Parties):\s*([A-Z][A-Za-z\s,]+)""")
    .map(Pattern.compile(_, Pattern.CASE_INSENSITIVE))

  private val effectiveDatePattern = Pattern.compile(
    """effective\s+(?:as\s+of\s+)?(\w+\s+\d{1,2},?\s+\d{4}|\d{1,2}/\d{1,2}/\d{4})""",
    Pattern.CASE_INSENSITIVE)
  private val monetaryPattern = Pattern.compile(
    """\$\s*([\d,]+(?:\.\d{2})?)\s*(?:per\s+(\w+)|(\w+))?""")
  private val governingLawPattern = Pattern.compile(
    """(?:governed by|governing law)[:\s]+(?:the\s+)?(?:laws?\s+of\s+)?(?:the\s+)?(?:State\s+of\s+)?(\w+(?:\s+\w+)?)""",
    Pattern.CASE_INSENSITIVE)

  def extractContract(text: String): Extracted = {
    val lower = text.toLowerCase
    // `domain_schemas.py:203-212`: best-of keyword counts; min(1, score/3)
    var bestType = "other"; var bestScore = 0
    for ((ctype, kws) <- contractTypeKeywords) {
      val s = kws.count(lower.contains)
      if (s > bestScore) { bestScore = s; bestType = ctype }
    }
    val confidence = math.min(1.0, bestScore / 3.0)

    // parties: first 5000 chars, dedup, >3 chars, cap 10 (`:215-224`)
    val head = text.take(5000)
    val parties = partyPatterns.flatMap { p =>
      val m = p.matcher(head)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group(1)
      out.result()
    }.map(_.trim).filter(_.length > 3).distinct.take(10)

    val presentTerms = legalTerms.filter(lower.contains)

    val monetary = {
      val m = monetaryPattern.matcher(text)
      val out = Seq.newBuilder[String]
      while (m.find() && out.result().size < 20) out += m.group(1).replace(",", "")
      out.result()
    }

    val governingLaw = {
      val m = governingLawPattern.matcher(text)
      if (m.find()) Some(m.group(1).trim) else None
    }

    val title = extractTitle(text)

    Extracted(
      documentType = "contract",
      documentSubtype = bestType,
      confidence = confidence,
      title = title,
      parties = parties,
      keyTerms = presentTerms,
      references = Nil,
      filterTags = Map(
        "contract_type" -> bestType,
        "has_indemnification" -> lower.contains("indemnification").toString,
        "has_termination_clause" -> lower.contains("termination").toString,
        "has_confidentiality" -> lower.contains("confidential").toString,
        "has_non_compete" -> (lower.contains("non-compete") || lower.contains("noncompete")).toString,
        "has_arbitration" -> lower.contains("arbitration").toString,
        "governing_law" -> governingLaw.getOrElse(""),
        "monetary_values" -> monetary.mkString(",")))
  }

  private val allCapsLine = Pattern.compile("""^[A-Z][A-Z\s]+$""")

  /** `domain_schemas.py:268-279`: ALL-CAPS or agreement-ish line in the
    * first 20 lines. */
  private def extractTitle(text: String): Option[String] = {
    text.split("\n").take(20).map(_.trim).find { line =>
      line.length > 10 && line.length < 200 &&
        (allCapsLine.matcher(line).matches() ||
          Seq("agreement", "contract", "amendment").exists(line.toLowerCase.contains))
    }
  }

  // ---- IRC/tax extractor (`domain_schemas.py:294-397`) -------------------

  private val ircSectionPattern = Pattern.compile(
    """(?:IRC\s*)?(?:§|Section)\s*(\d+(?:\([a-z]\))?(?:\(\d+\))?)""")
  private val taxFormPattern = Pattern.compile("""Form\s+(\d+(?:-\w+)?)""")

  val taxCategories: Map[String, Seq[String]] = Map(
    "income_tax" -> Seq("income tax", "taxable income", "gross income", "adjusted gross"),
    "estate_tax" -> Seq("estate tax", "gift tax", "inheritance", "decedent"),
    "employment_tax" -> Seq("payroll tax", "fica", "medicare", "unemployment"),
    "excise_tax" -> Seq("excise tax", "fuel tax", "tobacco", "alcohol"),
    "corporate_tax" -> Seq("corporate tax", "c corporation", "s corporation"),
    "capital_gains" -> Seq("capital gain", "capital loss", "basis", "depreciation"),
    "deductions" -> Seq("deduction", "exemption", "credit", "charitable"))

  def extractTax(text: String): Extracted = {
    val lower = text.toLowerCase
    def findAll(p: Pattern, cap: Int): Seq[String] = {
      val m = p.matcher(text)
      val out = scala.collection.mutable.LinkedHashSet[String]()
      while (m.find()) out += m.group(1)
      out.toSeq.take(cap)
    }
    val sections = findAll(ircSectionPattern, 50)
    val forms = findAll(taxFormPattern, 20)
    val categories = taxCategories.toSeq.sortBy(_._1)
      .collect { case (c, kws) if kws.exists(lower.contains) => c }
    Extracted("irc_code", categories.headOption.getOrElse("general"),
      if (sections.nonEmpty) 0.8 else 0.5, None, Nil, categories,
      sections ++ forms,
      Map(
        "irc_sections" -> sections.mkString(","),
        "tax_forms" -> forms.mkString(","),
        "tax_categories" -> categories.mkString(","),
        "is_regulation" -> (lower.contains("regulation") || lower.contains("treasury")).toString,
        "is_guidance" -> Seq("notice", "revenue ruling", "revenue procedure").exists(lower.contains).toString))
  }

  // ---- building-code extractor (`domain_schemas.py:400-521`) -------------

  val codeTypes: Map[String, Seq[String]] = Map(
    "ibc" -> Seq("international building code", "ibc"),
    "irc_building" -> Seq("international residential code"),
    "ifc" -> Seq("international fire code", "ifc"),
    "imc" -> Seq("international mechanical code", "imc"),
    "ipc" -> Seq("international plumbing code", "ipc"),
    "iecc" -> Seq("international energy conservation code", "iecc"),
    "nfpa" -> Seq("nfpa", "national fire protection"),
    "ada" -> Seq("ada", "americans with disabilities", "accessibility"),
    "local" -> Seq("municipal code", "city code", "county code"))

  val buildingCategories: Map[String, Seq[String]] = Map(
    "structural" -> Seq("structural", "foundation", "load-bearing", "seismic"),
    "fire_safety" -> Seq("fire", "sprinkler", "egress", "smoke", "alarm"),
    "electrical" -> Seq("electrical", "wiring", "circuit", "voltage"),
    "plumbing" -> Seq("plumbing", "drainage", "water supply", "fixture"),
    "mechanical" -> Seq("hvac", "ventilation", "heating", "cooling"),
    "accessibility" -> Seq("accessible", "ada", "wheelchair", "ramp"),
    "energy" -> Seq("energy", "insulation", "efficiency", "thermal"),
    "occupancy" -> Seq("occupancy", "egress", "exit", "capacity"))

  def extractBuilding(text: String): Extracted = {
    val lower = text.toLowerCase
    val codes = codeTypes.toSeq.sortBy(_._1)
      .collect { case (c, kws) if kws.exists(lower.contains) => c }
    val categories = buildingCategories.toSeq.sortBy(_._1)
      .collect { case (c, kws) if kws.exists(lower.contains) => c }
    Extracted("building_code", codes.headOption.getOrElse("general"),
      if (codes.nonEmpty) 0.8 else 0.5, None, Nil, categories, codes,
      Map(
        "code_types" -> codes.mkString(","),
        "building_categories" -> categories.mkString(",")))
  }

  // ---- financial extractor (`domain_schemas.py:524-652`) -----------------

  val reportTypes: Map[String, Seq[String]] = Map(
    "10-k" -> Seq("10-k", "annual report", "form 10-k"),
    "10-q" -> Seq("10-q", "quarterly report", "form 10-q"),
    "8-k" -> Seq("8-k", "current report", "form 8-k"),
    "earnings" -> Seq("earnings", "earnings call", "earnings release"),
    "budget" -> Seq("budget", "forecast", "projection"),
    "audit" -> Seq("audit", "audited", "auditor"),
    "investor" -> Seq("investor presentation", "investor deck"))

  val financialMetrics: Seq[String] = Seq(
    "revenue", "net income", "ebitda", "gross margin", "operating income",
    "cash flow", "assets", "liabilities", "equity", "earnings per share",
    "return on equity", "debt ratio", "current ratio")

  def extractFinancial(text: String): Extracted = {
    val lower = text.toLowerCase
    var bestType = "general"; var bestScore = 0
    for ((rtype, kws) <- reportTypes.toSeq.sortBy(_._1)) {
      val s = kws.count(lower.contains)
      if (s > bestScore) { bestScore = s; bestType = rtype }
    }
    val metrics = financialMetrics.filter(lower.contains)
    Extracted("financial_report", bestType,
      math.min(1.0, bestScore / 3.0), None, Nil, metrics, Nil,
      Map(
        "report_type" -> bestType,
        "financial_metrics" -> metrics.mkString(",")))
  }

  // ---- router (`domain_schemas.py:660-733`) ------------------------------

  val routerKeywords: Map[String, Seq[String]] = Map(
    "contract" -> Seq("agreement", "contract", "whereas", "party", "parties"),
    "irc_code" -> Seq("irc", "internal revenue", "tax code", "treasury regulation"),
    "building_code" -> Seq("building code", "ibc", "fire code", "occupancy"),
    "financial_report" -> Seq("10-k", "10-q", "earnings", "revenue", "fiscal year"))

  def detectDocumentType(text: String, filename: Option[String] = None): String = {
    filename.map(_.toLowerCase).foreach { f =>
      if (Seq("irc", "tax", "revenue").exists(f.contains)) return "irc_code"
      if (Seq("ibc", "building", "code").exists(f.contains)) return "building_code"
      if (Seq("10k", "10q", "financial", "earnings").exists(f.contains)) return "financial_report"
    }
    val lower = text.toLowerCase
    val scores = routerKeywords.toSeq.sortBy(_._1)
      .map { case (t, kws) => t -> kws.count(lower.contains) }
    val (best, score) = scores.maxBy(_._2)
    if (score >= 2) best else "contract"
  }

  /** Unified entry (`domain_schemas.py:686-705`). */
  def extract(text: String, filename: Option[String] = None,
              typeHint: Option[String] = None): Extracted = {
    val docType = typeHint.getOrElse(detectDocumentType(text, filename))
    docType match {
      case "irc_code" => extractTax(text)
      case "building_code" => extractBuilding(text)
      case "financial_report" => extractFinancial(text)
      case _ => extractContract(text)
    }
  }
}
