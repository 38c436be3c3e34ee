package graft.ingest

import java.util.regex.Pattern

/** Document-quality analysis and pipeline routing (I2, reference
  * `src/quality/document_quality.py:100-447`): five sub-scores with the
  * reference's weights (text .25 / ocr .30 / format .15 / structure .15
  * / coherence .15), tier thresholds .8/.5/.2, tier → pipeline and
  * tier → chunk-strategy routing (`chunking_service.py:64-69`).
  *
  * Driver-side pure function; the per-row variant used in the batch
  * pipeline goes through [[graft.operators.TextAnalysis]]'s column
  * bundle (same metric family, column-expression form).
  */
object QualityAnalyzer {

  case class Report(
      overallScore: Double,
      tier: String, // high|medium|low|garbage
      textScore: Double,
      ocrScore: Double,
      formatScore: Double,
      structureScore: Double,
      coherenceScore: Double,
      recommendedPipeline: String, // hierarchical|standard|simple|manual
      manualReviewRequired: Boolean,
      chunkStrategy: String) // sdpm|semantic|sentence|token

  /** `document_quality.py:67-77`. */
  private val ocrPatterns = Seq(
    """[Il1]{3,}""", """[O0]{3,}""", """[^\x00-\x7F]{5,}""",
    """\b[a-z]+[A-Z]+[a-z]+\b""", """[.,]{3,}""", """\s{5,}""",
    """[|]{2,}""", """[_]{5,}""", """\b\w{20,}\b""").map(Pattern.compile(_))

  /** `document_quality.py:80-88` (MULTILINE). */
  private val structurePatterns = Seq(
    """^#{1,6}\s+\w+""", """^\d+\.\s+\w+""", """^[A-Z][A-Z\s]+:""",
    """^\s*•\s+\w+""", """^(Section|Article|Chapter)\s+\d+""",
    """^Table\s+\d+""", """^Figure\s+\d+""")
    .map(Pattern.compile(_, Pattern.MULTILINE))

  /** `document_quality.py:91-95` (IGNORECASE). */
  private val gibberishPatterns = Seq(
    """[bcdfghjklmnpqrstvwxz]{5,}""", """[aeiou]{5,}""", """(.)\1{4,}""")
    .map(Pattern.compile(_, Pattern.CASE_INSENSITIVE))

  private val leadingWs = Pattern.compile("""^\s+""")
  // precompiled: String.split("\\s+") re-compiles per call — this runs
  // per document in the ingest flatMap (guide §1.2 step 2)
  private val ws = Pattern.compile("""\s+""")

  /** `chunking_service.py:64-69`: QUALITY_STRATEGY_MAP. */
  val strategyMap: Map[String, String] = Map(
    "high" -> "sdpm", "medium" -> "semantic",
    "low" -> "sentence", "garbage" -> "token")

  private def countMatches(p: Pattern, text: String): Int = {
    val m = p.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def analyze(text: String): Report = {
    // `document_quality.py:129-141`: near-empty short-circuit
    if (text == null || text.trim.length < 50)
      return Report(0.0, "garbage", 0.0, 0.0, 0.0, 0.0, 0.0,
        "manual", manualReviewRequired = true, strategyMap("garbage"))

    val textScore = scoreTextExtraction(text)
    val ocrScore = scoreOcr(text)
    val formatScore = scoreFormatting(text)
    val structureScore = scoreStructure(text)
    val coherenceScore = scoreCoherence(text)

    val overall = 0.25 * textScore + 0.30 * ocrScore + 0.15 * formatScore +
      0.15 * structureScore + 0.15 * coherenceScore

    val tier =
      if (overall >= 0.8) "high"
      else if (overall >= 0.5) "medium"
      else if (overall >= 0.2) "low"
      else "garbage"

    val (pipeline, manual) = tier match {
      case "high" => ("hierarchical", false)
      case "medium" => ("standard", false)
      case "low" => ("simple", true)
      case _ => ("manual", true)
    }

    Report(math.rint(overall * 1000) / 1000, tier, textScore, ocrScore,
      formatScore, structureScore, coherenceScore, pipeline, manual,
      strategyMap(tier))
  }

  /** `document_quality.py:206-229`. */
  private def scoreTextExtraction(text: String): Double = {
    var score = 1.0
    val wordCount = ws.split(text).count(_.nonEmpty)
    if (wordCount < 10) return 0.1
    if (wordCount < 50) score -= 0.3
    val alphaRatio = text.count(_.isLetter).toDouble / text.length
    if (alphaRatio < 0.3) score -= 0.3
    else if (alphaRatio < 0.5) score -= 0.1
    val controlChars = text.count(c => c < 32 && c != '\n' && c != '\r' && c != '\t')
    if (controlChars > 0)
      score -= math.min(0.3, controlChars.toDouble / text.length * 10)
    math.max(0.0, score)
  }

  /** `document_quality.py:231-262`. */
  private def scoreOcr(text: String): Double = {
    var score = 1.0
    val perK = text.length / 1000.0
    val errors = ocrPatterns.map(countMatches(_, text)).sum
    val errorDensity = errors / perK
    if (errorDensity > 10) score -= 0.5
    else if (errorDensity > 5) score -= 0.3
    else if (errorDensity > 2) score -= 0.1
    val gibberish = gibberishPatterns.map(countMatches(_, text)).sum
    val gibberishDensity = gibberish / perK
    if (gibberishDensity > 5) score -= 0.3
    else if (gibberishDensity > 2) score -= 0.15
    math.max(0.0, score)
  }

  /** `document_quality.py:264-296`. */
  private def scoreFormatting(text: String): Double = {
    var score = 1.0
    val lines = text.split("\n", -1)
    if (lines.isEmpty) return 0.5
    val lens = lines.filter(_.trim.nonEmpty).map(_.length.toDouble)
    if (lens.nonEmpty) {
      val avg = lens.sum / lens.length
      val variance = lens.map(l => (l - avg) * (l - avg)).sum / lens.length
      if (variance > 10000) score -= 0.2
    }
    val blankRatio = lines.count(_.trim.isEmpty).toDouble / lines.length
    if (blankRatio > 0.5) score -= 0.2
    val indents = lines.filter(_.trim.nonEmpty)
      .map(l => l.length - leadingWs.matcher(l).replaceFirst("").length)
    if (indents.nonEmpty && indents.distinct.length > 20) score -= 0.1
    math.max(0.0, score)
  }

  /** `document_quality.py:298-317`. */
  private def scoreStructure(text: String): Double = {
    val n = structurePatterns.map(countMatches(_, text)).sum
    if (n > 20) 1.0
    else if (n > 10) 0.85
    else if (n > 5) 0.7
    else if (n > 0) 0.6
    else 0.5
  }

  /** `document_quality.py:319-354`. */
  private def scoreCoherence(text: String): Double = {
    var score = 1.0
    val words = ws.split(text.toLowerCase).filter(_.nonEmpty)
    if (words.length < 20) return 0.5
    val avgLen = words.map(_.length).sum.toDouble / words.length
    if (avgLen < 2 || avgLen > 12) score -= 0.3
    else if (avgLen < 3 || avgLen > 8) score -= 0.1
    val uniqueRatio = words.distinct.length.toDouble / words.length
    if (uniqueRatio < 0.1) score -= 0.3
    else if (uniqueRatio > 0.95 && words.length > 500) score -= 0.1
    val common = Set("the", "a", "an", "is", "are", "was", "were", "of",
      "to", "and", "in", "for", "on", "with")
    val commonRatio = words.count(common.contains).toDouble / words.length
    if (commonRatio < 0.01) score -= 0.2
    math.max(0.0, score)
  }
}
