package graft.ingest

import java.util.regex.Pattern

/** Document-structure detection (I3, reference
  * `src/chunking/chunking_service.py:83-207`): doc-type-specific
  * per-line section patterns (legal / technical / code / financial),
  * nesting level inferred from dotted numbering.
  */
object StructureDetector {

  case class Section(
      title: String,
      number: Option[String],
      level: Int,
      lineNumber: Int,
      start: Int,
      end: Int)

  /** `chunking_service.py:95-131`, per family. */
  private def compile(ps: Seq[String]): Seq[Pattern] = ps.map(Pattern.compile(_))

  val legalPatterns: Seq[Pattern] = compile(Seq(
    """^(Article|ARTICLE)\s+([\dIVXLC]+)[:\.]?\s*(.*)""",
    """^(Section|SECTION)\s+(\d+(?:\.\d+)*)[:\.]?\s*(.*)""",
    """^(Clause|CLAUSE)\s+(\d+(?:\.\d+)*)[:\.]?\s*(.*)""",
    """^(\d+(?:\.\d+)*)\s+([A-Z][^.]+)""",
    """^\(([a-z])\)\s+(.+)""",
    """^(WHEREAS|RECITALS?|DEFINITIONS?|PREAMBLE)[:\s]*""",
    """^(Exhibit|EXHIBIT|Schedule|SCHEDULE|Annexure|ANNEXURE)\s+([A-Z0-9]+)"""))

  val technicalPatterns: Seq[Pattern] = compile(Seq(
    """^(Chapter|CHAPTER)\s+(\d+)[:\.]?\s*(.*)""",
    """^(\d+(?:\.\d+)*)\s+(SCOPE|DESIGN|SPECIFICATIONS?|REQUIREMENTS?)""",
    """^(Part|PART)\s+([A-Z0-9]+)[:\.]?\s*(.*)""",
    """^(Drawing|DRAWING)\s+No\.?\s*(\S+)"""))

  val codePatterns: Seq[Pattern] = compile(Seq(
    """^§\s*(\d+(?:\.\d+)*)\s+(.*)""",
    """^(\d+)\s+CFR\s+(\d+(?:\.\d+)*)""",
    """^IRC\s+(\d+(?:\.\d+)*)""",
    """^IBC\s+(\d+(?:\.\d+)*)""",
    """^IS\s+(\d+)[:\s]""",
    """^NBC\s+(\d+(?:\.\d+)*)"""))

  val financialPatterns: Seq[Pattern] = compile(Seq(
    """^(Executive Summary|Management Discussion)""",
    """^(Balance Sheet|Income Statement|Cash Flow)""",
    """^(Notes to Financial Statements)""",
    """^(Q[1-4]\s+\d{4}|FY\s*\d{4})""",
    """^(Bill of Quantities|BOQ|Schedule of Rates)""",
    """^(Item|Sl\.?\s*No\.?)\s+(\d+)"""))

  def patternsFor(documentType: String): Seq[Pattern] = documentType match {
    case "legal" | "contract" => legalPatterns
    case "technical" => technicalPatterns
    case "code" | "building_code" | "irc_code" => codePatterns
    case "financial" | "financial_report" => financialPatterns
    case _ => legalPatterns ++ technicalPatterns ++ codePatterns ++ financialPatterns
  }

  private val numericSection = Pattern.compile("""\d+(\.\d+)*""")
  private val sectionNumber = Pattern.compile("""(\d+(?:\.\d+)*)""")

  /** Nesting level = dot count in the section number + 1 ("2.1.3" → 3);
    * non-numeric headings are level 1. */
  def nestingLevel(number: Option[String]): Int =
    number.filter(n => numericSection.matcher(n).matches())
      .map(n => n.count(_ == '.') + 1).getOrElse(1)

  /** Scan text line-by-line; each heading opens a section that ends at
    * the next heading (or EOF). */
  def detect(text: String, documentType: String = "general"): Seq[Section] = {
    val ps = patternsFor(documentType)
    val lines = text.split("\n", -1)
    val headings = Seq.newBuilder[(Int, Int, String, Option[String])]
    var offset = 0
    for ((line, i) <- lines.zipWithIndex) {
      val stripped = line.trim
      val matched = ps.exists(_.matcher(stripped).find())
      if (matched && stripped.nonEmpty) {
        val numM = sectionNumber.matcher(stripped)
        val number = if (numM.find()) Some(numM.group(1)) else None
        headings += ((i, offset, stripped, number))
      }
      offset += line.length + 1
    }
    val hs = headings.result()
    hs.zipWithIndex.map { case ((lineNo, start, title, number), idx) =>
      val end = if (idx + 1 < hs.length) hs(idx + 1)._2 else text.length
      Section(title, number, nestingLevel(number), lineNo, start, end)
    }
  }
}
