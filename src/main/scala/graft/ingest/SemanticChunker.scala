package graft.ingest

import graft.functions.{EmbedFunctions, TextFunctions}

/** Semantic-boundary chunking (I4, reference
  * `src/chunking/chunking_service.py:286-312`): the reference's HIGH /
  * MEDIUM quality tiers run Chonkie's SDPM / semantic strategies,
  * whose boundaries come from sentence-embedding similarity. The
  * engine is model-free, so this is the deterministic approximation
  * (VERDICT r2 #8): sentences → feature-hash unit vectors (the same
  * I9 stand-in embedder) → a boundary wherever the next sentence's
  * cosine against the running group centroid drops below the
  * threshold, within a token budget. SDPM adds Chonkie's second pass:
  * skip-window merging, which re-joins groups separated by one
  * interjected group when their centroids still agree.
  *
  * Strategies produce genuinely different boundaries per tier
  * (ChunkerFusionSpec pins this):
  *  - `sdpm` (HIGH): semantic groups + skip-window merge
  *  - `semantic` (MEDIUM): semantic groups
  *  - `sentence` (LOW): budget-only sentence packing
  *  - `token` (GARBAGE): fixed token windows (`Chunker.tokenWindows`
  *    semantics, row form)
  *
  * Pure per-document functions — the pipeline applies them as flatMap
  * generators, so the 100 TB shape is the same shuffle-free map pass
  * as the hierarchical chunker.
  */
object SemanticChunker {

  case class Cfg(
      maxTokens: Int = 512, // `chunking_service.py:229` chunk size
      boundaryThreshold: Double = 0.25,
      mergeThreshold: Double = 0.5,
      dim: Int = 64)

  /** Same sentence rule as the hierarchical chunker
    * (`hierarchical_chunker.py:314-316`) — one shared constant. */
  private val sentenceRe = HierarchicalChunker.SentenceSplit

  def sentences(text: String): Seq[String] =
    sentenceRe.split(text).map(_.trim).filter(_.nonEmpty).toSeq

  private def embed(s: String, dim: Int): Array[Double] =
    EmbedFunctions.embedQuery(TextFunctions.tokenizeJvm(s), dim)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Unit-norm mean of unit vectors (zero stays zero). */
  private def centroid(vs: Seq[Array[Double]]): Array[Double] = {
    val dim = vs.head.length
    val m = new Array[Double](dim)
    for (v <- vs; i <- 0 until dim) m(i) += v(i)
    val n = math.sqrt(dot(m, m))
    if (n > 0) m.map(_ / n) else m
  }

  private def tokenCount(s: String): Int =
    HierarchicalChunker.Ws.split(s).count(_.nonEmpty)

  /** First pass: greedy semantic grouping — a sentence joins the open
    * group while its cosine to the group centroid stays ≥ the boundary
    * threshold and the token budget holds. Returns each group with its
    * sentence vectors so the SDPM pass never re-embeds. */
  private[ingest] def semanticGroupsVec(sents: Seq[String], cfg: Cfg)
      : Seq[(Seq[String], Seq[Array[Double]])] = {
    if (sents.isEmpty) return Nil
    val vecs = sents.map(embed(_, cfg.dim))
    val groups = Seq.newBuilder[(Seq[String], Seq[Array[Double]])]
    var cur = Seq(0)
    var curToks = tokenCount(sents(0))
    for (i <- 1 until sents.length) {
      val t = tokenCount(sents(i))
      val sim = dot(centroid(cur.map(vecs)), vecs(i))
      if (sim >= cfg.boundaryThreshold && curToks + t <= cfg.maxTokens) {
        cur :+= i; curToks += t
      } else {
        groups += ((cur.map(sents), cur.map(vecs))); cur = Seq(i); curToks = t
      }
    }
    groups += ((cur.map(sents), cur.map(vecs)))
    groups.result()
  }

  def semanticGroups(sents: Seq[String], cfg: Cfg): Seq[Seq[String]] =
    semanticGroupsVec(sents, cfg).map(_._1)

  /** SDPM second pass (Chonkie's skip-window=1 merge): when groups i
    * and i+2 still agree (centroid cosine ≥ mergeThreshold) and the
    * combined budget holds, the interjected group i+1 is absorbed into
    * one chunk — the "double-pass merging" that re-joins a topic split
    * by a digression. */
  def sdpmMerge(groups: Seq[Seq[String]], cfg: Cfg): Seq[Seq[String]] =
    sdpmMergeVec(groups.map(g => (g, g.map(embed(_, cfg.dim)))), cfg)

  private[ingest] def sdpmMergeVec(
      groups: Seq[(Seq[String], Seq[Array[Double]])],
      cfg: Cfg): Seq[Seq[String]] = {
    if (groups.size < 3) return groups.map(_._1)
    val out = Seq.newBuilder[Seq[String]]
    var i = 0
    while (i < groups.size) {
      if (i + 2 < groups.size) {
        val (a, aVecs) = groups(i); val (c, cVecs) = groups(i + 2)
        val va = centroid(aVecs)
        val vc = centroid(cVecs)
        val toks = (a ++ groups(i + 1)._1 ++ c).map(tokenCount).sum
        if (dot(va, vc) >= cfg.mergeThreshold && toks <= cfg.maxTokens) {
          out += (a ++ groups(i + 1)._1 ++ c)
          i += 3
        } else { out += a; i += 1 }
      } else { out += groups(i)._1; i += 1 }
    }
    out.result()
  }

  /** Budget-only sentence packing (LOW tier — no semantic checks). */
  def sentenceGroups(sents: Seq[String], cfg: Cfg): Seq[Seq[String]] = {
    if (sents.isEmpty) return Nil
    val groups = Seq.newBuilder[Seq[String]]
    var cur = Seq(sents.head)
    var curToks = tokenCount(sents.head)
    for (s <- sents.tail) {
      val t = tokenCount(s)
      if (curToks + t <= cfg.maxTokens) { cur :+= s; curToks += t }
      else { groups += cur; cur = Seq(s); curToks = t }
    }
    groups += cur
    groups.result()
  }

  /** Strategy router (`chunking_service.py:64-69` QUALITY_STRATEGY_MAP
    * semantics): strategy label → chunk texts. Labels are the ones
    * QualityAnalyzer emits per tier. */
  def chunk(text: String, strategy: String, cfg: Cfg = Cfg()): Seq[String] = {
    val sents = sentences(text)
    strategy match {
      case "sdpm" =>
        // vec-threaded pipeline: each sentence embedded exactly once
        sdpmMergeVec(semanticGroupsVec(sents, cfg), cfg).map(_.mkString(" "))
      case "semantic" => semanticGroups(sents, cfg).map(_.mkString(" "))
      case "sentence" => sentenceGroups(sents, cfg).map(_.mkString(" "))
      case _ => // "token": fixed windows over whitespace tokens
        val toks = HierarchicalChunker.Ws.split(text).filter(_.nonEmpty)
        if (toks.isEmpty) Nil
        else toks.grouped(cfg.maxTokens).map(_.mkString(" ")).toSeq
    }
  }
}
