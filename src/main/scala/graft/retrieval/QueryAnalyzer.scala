package graft.retrieval

import java.util.regex.Pattern

/** Driver-side query analysis (no data touched):
  *  - modality routing V6 (`src/retrieval/query_analyzer.py:56-241`)
  *  - complexity → chunk level V7 (`src/chunking/hierarchical_chunker.py:550-610`)
  *  - precision-query detection V8 (`src/retrieval/enhanced_hybrid_search.py:73-121`)
  *  - query-type classification (`enhanced_hybrid_search.py:369-389`)
  * All regex/keyword constants reproduce the reference's tables.
  */
object QueryAnalyzer {

  // ---- V6: modality routing ---------------------------------------------

  sealed trait Modality { def name: String }
  case object Text extends Modality { val name = "text" }
  case object Visual extends Modality { val name = "visual" }
  case object Mixed extends Modality { val name = "mixed" }

  case class Analysis(
      query: String,
      modality: Modality,
      visualScore: Double,
      targetElements: Seq[String],
      weights: Map[String, Double],
      detectedPatterns: Seq[String]) {
    def shouldSearchVisualElements: Boolean =
      visualScore >= 0.3 || targetElements.nonEmpty
  }

  /** `query_analyzer.py:67-76`: element-reference patterns (+0.3 each). */
  private val visualPatterns: Seq[(Pattern, String)] = Seq(
    ("""\b(table|tables)\b""", "table"),
    ("""\b(figure|figures|fig\.?)\b""", "figure"),
    ("""\b(chart|charts)\b""", "chart"),
    ("""\b(diagram|diagrams)\b""", "diagram"),
    ("""\b(image|images|picture|pictures|photo|photos)\b""", "image"),
    ("""\b(graph|graphs)\b""", "graph"),
    ("""\b(formula|formulas|equation|equations)\b""", "formula"),
  ).map { case (p, t) => (Pattern.compile(p, Pattern.CASE_INSENSITIVE), t) }

  /** `query_analyzer.py:79-89`: intent patterns (+0.25 each). */
  private val intentPatterns: Seq[Pattern] = Seq(
    """what\s+does\s+the\s+(table|figure|chart|diagram)\s+show""",
    """according\s+to\s+the\s+(table|figure|chart)""",
    """in\s+the\s+(table|figure|chart|diagram)""",
    """from\s+the\s+(table|figure|chart)""",
    """(show|display|visualize|illustrate)""",
    """(look\s+at|see|view)\s+the\s+(table|figure|chart)""",
    """(data|values|numbers)\s+in\s+the\s+table""",
    """table\s+(shows?|displays?|contains?|lists?)""",
    """figure\s+(shows?|displays?|illustrates?)""",
  ).map(Pattern.compile(_, Pattern.CASE_INSENSITIVE))

  /** `query_analyzer.py:92-96`: weight presets per modality. */
  val defaultWeights: Map[String, Map[String, Double]] = Map(
    "text" -> Map("bm25" -> 0.35, "dense" -> 0.55, "colpali" -> 0.10),
    "visual" -> Map("bm25" -> 0.15, "dense" -> 0.25, "colpali" -> 0.60),
    "mixed" -> Map("bm25" -> 0.25, "dense" -> 0.35, "colpali" -> 0.40))

  /** V6 analyze (`query_analyzer.py:124-186`): score, classify, weight,
    * element-target boost (+0.1·n capped at 0.15, colpali capped 0.7,
    * renormalized). */
  def analyze(query: String, visualThreshold: Double = 0.3): Analysis = {
    val q = query.toLowerCase
    var score = 0.0
    val detected = Seq.newBuilder[String]
    val targets = scala.collection.mutable.LinkedHashSet[String]()

    for ((p, target) <- visualPatterns if p.matcher(q).find()) {
      score += 0.3
      detected += p.pattern()
      targets += target
    }
    for (p <- intentPatterns if p.matcher(q).find()) {
      score += 0.25
      detected += p.pattern()
    }
    score = math.min(score, 1.0)

    val modality: Modality =
      if (score >= 0.5) Visual
      else if (score >= visualThreshold) Mixed
      else Text

    var weights = defaultWeights(modality.name)
    if (targets.nonEmpty) {
      val boost = math.min(0.1 * targets.size, 0.15)
      val boosted = weights.updated("colpali",
        math.min(weights("colpali") + boost, 0.7))
      val total = boosted.values.sum
      weights = boosted.map { case (k, v) => k -> v / total }
    }

    Analysis(query, modality, score, targets.toSeq, weights, detected.result())
  }

  // ---- V7: complexity → retrieval level ---------------------------------

  /** `hierarchical_chunker.py:560-575`. */
  private val precisionKeywords = Seq(
    "exact", "specific", "precisely", "exactly",
    "table", "figure", "section", "article", "clause",
    "number", "amount", "value", "date", "deadline",
    "line", "paragraph", "sentence",
    "what is the", "what was the")

  private val broadKeywords = Seq(
    "overview", "summary", "about", "describe",
    "explain", "what does", "how does", "why does",
    "generally", "overall", "main", "key points")

  /** `hierarchical_chunker.py:577-610`: (level, confidence). */
  def complexity(query: String): (String, Double) = {
    val q = query.toLowerCase
    val precision = precisionKeywords.count(q.contains)
    val broad = broadKeywords.count(q.contains)
    if (precision > broad) {
      if (precision >= 2) ("sentence", 0.9) else ("sentence", 0.7)
    } else if (broad > precision) {
      if (broad >= 2) ("section", 0.9) else ("paragraph", 0.7)
    } else ("paragraph", 0.5)
  }

  // ---- V8: precision-query detection ------------------------------------

  /** `enhanced_hybrid_search.py:82-101`: (pattern, type). */
  private val precisionPatterns: Seq[(Pattern, String)] = Seq(
    ("""(?:in\s+)?table\s+(\d+|[A-Z])""", "table_reference"),
    ("""(?:in\s+)?figure\s+(\d+|[A-Z])""", "figure_reference"),
    ("""(?:in\s+)?exhibit\s+([A-Z]|\d+)""", "exhibit_reference"),
    ("""(?:in\s+)?section\s+(\d+(?:\.\d+)*)""", "section_reference"),
    ("""(?:in\s+)?article\s+(\d+|[IVXLC]+)""", "article_reference"),
    ("""(?:in\s+)?clause\s+(\d+(?:\.\d+)*)""", "clause_reference"),
    ("""(?:exact|specific|precise)\s+(?:amount|value|number|date)""", "exact_value"),
    ("""what\s+(?:is|was|are|were)\s+the\s+(?:exact|specific)""", "exact_value"),
    ("""(?:on\s+)?line\s+(\d+)""", "line_reference"),
    ("""(?:in\s+)?paragraph\s+(\d+)""", "paragraph_reference"),
  ).map { case (p, t) => (Pattern.compile(p, Pattern.CASE_INSENSITIVE), t) }

  /** (isPrecision, patternType, extractedReference). */
  def detectPrecision(query: String): (Boolean, Option[String], Option[String]) = {
    for ((p, ptype) <- precisionPatterns) {
      val m = p.matcher(query)
      if (m.find()) {
        val ref = if (m.groupCount() >= 1) Option(m.group(1)) else None
        return (true, Some(ptype), ref)
      }
    }
    (false, None, None)
  }

  // ---- §3.3: query-type classification ----------------------------------

  /** `enhanced_hybrid_search.py:369-389`: check order comparative →
    * temporal → reference → precise → broad. */
  def classify(query: String): String = {
    val q = query.toLowerCase
    if (Seq("compare", "difference", "vs", "versus", "between").exists(q.contains))
      "comparative"
    else if (Seq("when", "date", "before", "after", "during").exists(q.contains))
      "temporal"
    else if (Seq("table", "figure", "section", "article", "exhibit").exists(q.contains))
      "reference"
    else if (Seq("exact", "specific", "precise", "what is the").exists(q.contains))
      "precise"
    else "broad"
  }

  /** Precision-fallback search terms (`enhanced_hybrid_search.py:404-419`). */
  def precisionSearchTerms(ptype: String, reference: String): Seq[String] =
    ptype match {
      case "table_reference" => Seq(s"Table $reference", s"table $reference")
      case "section_reference" => Seq(s"Section $reference", s"section $reference")
      case "exhibit_reference" => Seq(s"Exhibit $reference", s"exhibit $reference")
      case _ => Seq(reference)
    }
}
