package graft.ingest

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Document-relationship extraction (I8, reference
  * `src/graph/document_graph.py:78-234`): six pattern families →
  * typed edges with confidence heuristics (.7 base; .9 for
  * cites/exhibits; −.2 long match; −.1 hedging; clamp [.3, 1]),
  * first-writer dedup by (source, target, type), and deferred
  * `unresolved:` targets resolved against a registered identifier
  * dim. The reference resolves incrementally (order-dependent); here
  * resolution is a deterministic second pass over the full identifier
  * table (SURVEY §7 risk 4).
  */
object RelationshipExtractor {

  case class Relation(
      source_id: String,
      target_id: String,
      relation_type: String,
      confidence: Double,
      context: String,
      raw_reference: String)

  /** `document_graph.py:86-125`, translated pattern-for-pattern. */
  val patterns: Seq[(String, Seq[Pattern])] = Seq(
    "amends" -> Seq(
      """amend(?:s|ed|ment to)?\s+(?:the\s+)?(?:original\s+)?(?:agreement|contract)?\s*(?:dated\s+)?([A-Z][^.]+?(?:\d{4}|agreement|contract))""",
      """(?:first|second|third|\d+(?:st|nd|rd|th))\s+amendment\s+to\s+([^.]+)"""),
    "supersedes" -> Seq(
      """supersedes?\s+(?:and replaces?\s+)?(?:all\s+)?(?:prior\s+)?([^.]+)""",
      """replaces?\s+(?:in\s+its\s+entirety\s+)?([^.]+)"""),
    "exhibits_to" -> Seq(
      """exhibit\s+([A-Z]|\d+)\s+(?:to|attached)""",
      """(?:see|refer to)\s+exhibit\s+([A-Z]|\d+)"""),
    "references" -> Seq(
      """(?:pursuant to|in accordance with|as defined in|as set forth in)\s+([^.]+)""",
      """(?:see|refer to|reference to)\s+([^.]+?(?:agreement|contract|document|section|article))"""),
    "cites" -> Seq(
      """(?:IRC|I\.R\.C\.)\s*(?:§|Section)\s*(\d+(?:\([a-z]\))?(?:\(\d+\))?)""",
      """(\d+)\s*(?:U\.S\.C\.|USC)\s*(?:§|Section)?\s*(\d+)""",
      """(\d+)\s*(?:C\.F\.R\.|CFR)\s*(?:§|Section)?\s*(\d+(?:\.\d+)?)"""),
    "incorporates" -> Seq(
      """incorporat(?:es?|ed|ing)\s+(?:herein\s+)?by\s+reference\s+([^.]+)""",
      """deemed\s+(?:to\s+be\s+)?incorporated\s+([^.]+)""")
  ).map { case (t, ps) =>
    t -> ps.map(Pattern.compile(_, Pattern.CASE_INSENSITIVE))
  }

  /** `document_graph.py:187-202`. */
  def confidence(relType: String, matchedText: String): Double = {
    var c = if (relType == "cites" || relType == "exhibits_to") 0.9 else 0.7
    if (matchedText.length > 200) c -= 0.2
    val lower = matchedText.toLowerCase
    if (Seq("may", "might", "similar").exists(lower.contains)) c -= 0.1
    math.max(0.3, math.min(1.0, c))
  }

  /** Extract all relations from one document's text
    * (`document_graph.py:137-185`): ±100-char context, first-writer
    * dedup by (source, target, type). Targets are `unresolved:<ref>`
    * until [[resolve]] runs. */
  def extract(text: String, sourceDocumentId: String): Seq[Relation] = {
    val out = Seq.newBuilder[Relation]
    for ((relType, ps) <- patterns; p <- ps) {
      val m = p.matcher(text)
      while (m.find()) {
        val ref = (if (m.groupCount() >= 1) Option(m.group(1)) else None)
          .getOrElse(m.group(0)).trim
        val start = math.max(0, m.start - 100)
        val end = math.min(text.length, m.end + 100)
        out += Relation(
          source_id = sourceDocumentId,
          target_id = s"unresolved:$ref",
          relation_type = relType,
          confidence = confidence(relType, m.group(0)),
          context = text.substring(start, end),
          raw_reference = ref)
      }
    }
    // first-writer-wins dedup (`document_graph.py:215-229`)
    val seen = scala.collection.mutable.HashSet[(String, String, String)]()
    out.result().filter { r =>
      seen.add((r.source_id, r.target_id, r.relation_type))
    }
  }

  /** Two-pass resolution (deterministic batch form of
    * `document_graph.py:332-350`): join unresolved raw references
    * against the registered identifier dim (identifier → document_id);
    * a reference resolves when it CONTAINS a known identifier
    * (case-insensitive substring, as the reference's
    * `identifier.lower() in reference_lower`). Ambiguity breaks ties by
    * longest identifier then lexicographic doc id. */
  def resolve(relations: Seq[Relation],
              identifiers: Seq[(String, String)]): Seq[Relation] = {
    val ids = identifiers.sortBy { case (ident, doc) => (-ident.length, doc) }
    relations.map { r =>
      if (!r.target_id.startsWith("unresolved:")) r
      else {
        val refLower = r.raw_reference.toLowerCase
        ids.find { case (ident, _) => refLower.contains(ident.toLowerCase) }
          .map { case (_, doc) => r.copy(target_id = doc) }
          .getOrElse(r)
      }
    }
  }

  /** Distributed edge extraction: flatMap over a (id, text) Dataset —
    * the generator form (§2.10) used by the batch pipeline. */
  def extractEdges(docs: DataFrame, idCol: String, textCol: String): Dataset[Relation] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(idCol, textCol).as[(String, String)]
      .flatMap { case (id, text) => extract(Option(text).getOrElse(""), id) }
  }
}
