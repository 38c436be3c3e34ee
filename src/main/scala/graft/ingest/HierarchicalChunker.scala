package graft.ingest

import java.util.regex.Pattern

import graft.model.{ChunkLevel, UnifiedChunk}

/** Hierarchical chunking (I5, reference
  * `src/chunking/hierarchical_chunker.py:290-547`): document → section
  * → paragraph → sentence tree with parent/children id conventions
  * `{doc}_sec_{i}_para_{j}_sent_{k}`. Defaults mirror the reference:
  * paragraph budget 400 chars with 50-word overlap, min section 100
  * chars, sentences ≥ 20 chars.
  *
  * Pure per-document function — the batch pipeline applies it as a
  * `flatMap` generator (§2.10), so chunking 100 TB is shuffle-free.
  */
class HierarchicalChunker(
    paragraphSize: Int = 400,
    paragraphOverlap: Int = 50,
    minSectionSize: Int = 100) extends Serializable {

  /** `hierarchical_chunker.py:314-316`. */
  private val sentencePattern = HierarchicalChunker.SentenceSplit

  def chunk(text: String, documentId: String,
            organizationId: String = "default",
            detectStructure: Boolean = true): Seq[UnifiedChunk] = {
    val out = Seq.newBuilder[UnifiedChunk]

    // document-level summary chunk (`:344-357`): text truncated at 2000
    val docText = if (text.length > 2000) text.take(2000) + "..." else text
    val docId = s"${documentId}_doc"
    out += UnifiedChunk(
      id = docId, document_id = documentId, text = docText,
      chunk_index = 0, level = ChunkLevel.Document,
      token_count = Some(HierarchicalChunker.Ws.split(text).count(_.nonEmpty)),
      organization_id = organizationId)

    // section chunks (`:385-438`)
    val sections: Seq[(String, Option[String], Option[String], Int, Int)] = {
      val detected = if (detectStructure) StructureDetector.detect(text, "legal") else Nil
      if (detected.isEmpty) {
        Seq((text, Some("Document Content"), None, 0, text.length))
      } else {
        detected.map { s =>
          (text.substring(s.start, s.end).trim, Some(s.title), s.number, s.start, s.end)
        }.filter(_._1.length >= minSectionSize)
      }
    }

    sections.zipWithIndex.foreach { case ((secText, title, number, start, end), i) =>
      val secId = s"${documentId}_sec_$i"
      out += UnifiedChunk(
        id = secId, document_id = documentId, text = secText,
        chunk_index = i, level = ChunkLevel.Section, parent_id = Some(docId),
        section_title = title, section_number = number,
        char_start = Some(start), char_end = Some(end),
        token_count = Some(HierarchicalChunker.Ws.split(secText).count(_.nonEmpty)),
        organization_id = organizationId)

      // paragraph packing with word overlap (`:440-489`)
      val paras = HierarchicalChunker.ParaSep.split(secText).map(_.trim).filter(_.nonEmpty)
      val paraChunks = Seq.newBuilder[String]
      var current = ""
      for (para <- paras) {
        if (current.length + para.length > paragraphSize && current.nonEmpty) {
          paraChunks += current
          current =
            if (paragraphOverlap > 0) {
              val words = HierarchicalChunker.Ws.split(current).filter(_.nonEmpty)
              val overlap =
                if (words.length > paragraphOverlap) words.takeRight(paragraphOverlap)
                else words
              overlap.mkString(" ") + " " + para
            } else para
        } else {
          current = (current + "\n\n" + para).trim
        }
      }
      if (current.nonEmpty) paraChunks += current

      paraChunks.result().zipWithIndex.foreach { case (paraText, j) =>
        val paraId = s"${secId}_para_$j"
        out += UnifiedChunk(
          id = paraId, document_id = documentId, text = paraText,
          chunk_index = j, level = ChunkLevel.Paragraph, parent_id = Some(secId),
          section_title = title,
          token_count = Some(HierarchicalChunker.Ws.split(paraText).count(_.nonEmpty)),
          organization_id = organizationId)

        // sentence chunks, skip < 20 chars (`:512-537`)
        sentencePattern.split(paraText).zipWithIndex.foreach { case (s, k) =>
          val sent = s.trim
          if (sent.length >= 20) {
            out += UnifiedChunk(
              id = s"${paraId}_sent_$k", document_id = documentId, text = sent,
              chunk_index = k, level = ChunkLevel.Sentence, parent_id = Some(paraId),
              section_title = title,
              token_count = Some(HierarchicalChunker.Ws.split(sent).count(_.nonEmpty)),
              organization_id = organizationId)
          }
        }
      }
    }
    out.result()
  }
}

object HierarchicalChunker {
  /** The ONE sentence-boundary rule (`hierarchical_chunker.py:314-316`)
    * — shared with [[SemanticChunker]] so the two strategies can never
    * silently diverge on what a sentence is. */
  val SentencePattern: String =
    """(?<=[.!?])\s+(?=[A-Z])|(?<=\n)\s*(?=[A-Z0-9])"""

  // Precompiled per-row patterns: String.split(regex) re-compiles its
  // Pattern on EVERY call (no single-char fast path applies to any of
  // these), and the chunker splits ~4×/chunk across millions of rows —
  // pure per-task overhead at 100 TB (guide §1.2 step 2). Pattern.split
  // is semantics-identical to String.split.
  val SentenceSplit: Pattern = Pattern.compile(SentencePattern)
  private[graft] val Ws: Pattern = Pattern.compile("""\s+""")
  private[graft] val ParaSep: Pattern = Pattern.compile("""\n\s*\n""")
}
