package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.retrieval.{Acronyms, QueryAnalyzer}

/** q71: the query-understanding layer (V6 modality routing + weight
  * presets/boost, V7 complexity → chunk level, V8 precision detection,
  * §3.3 query-type classification, V11 acronym expansion with context
  * disambiguation + domain detection) mapped over a fixed query list —
  * the reference's own demo queries (`query_analyzer.py:260-269`)
  * plus precision/acronym probes. The oracle is a pinned literal table
  * (per VERDICT r2 #3): the semantics are grounded against the
  * reference by QueryAnalyzerSpec/AcronymQualitySpec; the gate pins
  * them end-to-end against drift. Floats are rounded to 8 decimals on
  * both sides so the pinned decimals parse to the identical doubles.
  */
object QueryGates {

  /** Fixed probe list — every analyzer branch is hit by at least one:
    * visual/intent patterns, all three modality tiers, the element
    * boost + renormalization, precision vs broad keyword counts, each
    * precision pattern type, all classify branches, IRC tax-vs-building
    * disambiguation, and multi-acronym expansion. */
  val probes: Seq[String] = Seq(
    "What does the table show about revenue?",
    "Show me the chart with quarterly earnings",
    "payment terms in the contract",
    "figure 3 illustrates the architecture",
    "What is the exact amount in Table 2?",
    "overview and summary of the agreement",
    "IRC section 162 deduction for business expenses",
    "IRC requirements for residential dwelling construction",
    "termination clause in section 4.2",
    "compare revenue between Q1 and Q2",
    "when is the filing deadline",
    "NDA confidentiality obligations",
    "EBITDA margin and earnings growth",
    "describe the main key points generally",
    "data values in the table from the figure",
    "specific date on line 42 of exhibit A")

  private def r8(x: Double): Double = math.round(x * 1e8) / 1e8

  def queryAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = probes.zipWithIndex.map { case (q, i) =>
      val a = QueryAnalyzer.analyze(q)
      val (level, conf) = QueryAnalyzer.complexity(q)
      val (isPrec, ptype, pref) = QueryAnalyzer.detectPrecision(q)
      val qtype = QueryAnalyzer.classify(q)
      val (expanded, expansions) = Acronyms.expandQuery(q)
      val domain = Acronyms.detectDomain(q)
      (i.toLong, q, a.modality.name, r8(a.visualScore),
        a.targetElements.mkString(","),
        r8(a.weights("bm25")), r8(a.weights("dense")), r8(a.weights("colpali")),
        level, r8(conf), isPrec, ptype.getOrElse(""), pref.getOrElse(""),
        qtype, expanded, expansions.mkString("|"), domain)
    }
    rows.toDF("qid", "query", "modality", "visual_score", "targets",
        "w_bm25", "w_dense", "w_colpali", "level", "level_conf",
        "is_precision", "ptype", "pref", "qtype", "expanded",
        "expansions", "domain")
      .orderBy(col("qid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_query_analysis" -> (queryAnalysis _))

  val oracle: Map[String, String] = Map(
    "q71_query_analysis" -> QueryGatesOracle.sql)
}
