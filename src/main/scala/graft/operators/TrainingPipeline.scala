package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end training-corpus curation — the composed pipeline a
  * 100 TB pretraining-data user actually runs, chaining the
  * individually-gated operators in their canonical order:
  *
  *   PII scrub → exact dedup → line clean → cross-doc line dedup →
  *   MinHash near-dedup (keep canonical) → eval-set decontamination →
  *   stratified sampling → fixed-length sequence packing
  *
  * Exact dedup runs FIRST among the reducers: it is the cheapest pass
  * (one md5 aggregate), and it must precede line dedup — two identical
  * docs share every line, so line-level keep-first would otherwise
  * empty the second copy line-by-line instead of dropping it whole.
  *
  * Every stage is the oracle-gated primitive (q63, q80, q81, q28,
  * q29/q30/q56, q57, q59, q82); this object only sequences them and
  * reports per-stage survivor counts. Each stage's output feeds the
  * next as a plain DataFrame, so Catalyst fuses adjacent row-local
  * stages (scrub + clean run in one pass over the corpus) and the
  * shuffling stages keep their individually-asserted physical shapes.
  */
object TrainingPipeline {

  case class Cfg(
      minWordsPerLine: Int = 3,
      shingleN: Int = 8, // decontamination n-gram (q57 convention)
      maxContamFrac: Double = 0.05, // drop docs above this eval overlap
      minhashK: Int = 16,
      lshBands: Int = 4,
      lshRows: Int = 4,
      jaccardThreshold: Double = 0.8,
      sampleRates: Map[String, Double] = Map.empty,
      defaultSampleRate: Double = 1.0,
      sampleSalt: String = "s42",
      seqLen: Long = 512L)

  /** Survivor counts after each stage (a count() per stage — cheap
    * aggregates, and the intermediate frames below are cached exactly
    * because two consumers need them: the count and the next stage). */
  case class Report(
      nInput: Long,
      nAfterExactDedup: Long,
      nAfterLineClean: Long,
      nAfterLineDedup: Long,
      nAfterNearDedup: Long,
      nAfterDecontam: Long,
      nSampled: Long,
      nSequences: Long,
      nTokens: Long)

  /** Run the full pipeline. `docs` needs (idCol: long-castable, textCol,
    * stratumCol); `evalDocs` needs textCol. Returns the packed sequence
    * spans (seq_id, id, doc_from, len, seq_from) and the stage report.
    *
    * `withReport = false` skips every per-stage count job (all Report
    * counts become -1 except the sequence stats, which ride the final
    * aggregate) — the production mode, where the only actions are the
    * dedup-cluster iteration and whatever the caller runs on `spans`. */
  def curate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
             textCol: String, stratumCol: String,
             cfg: Cfg = Cfg(), withReport: Boolean = true): (DataFrame, Report) = {
    def stageCount(df: DataFrame): Long = if (withReport) df.count() else -1L
    val nInput = stageCount(docs)

    // 1: PII scrub (row-local; fuses with the next stage's scan)
    val scrubbed = docs.select(col(idCol).as("id"),
      col(stratumCol).as("stratum"), Pii.redact(col(textCol)).as("text"))
      .cache()

    // 2: exact dedup — only non-canonical members of md5 groups drop
    val dupGroups = Dedup.exactGroups(scrubbed, "id", "text")
    val exactLosers = scrubbed
      .join(dupGroups, md5(col("text")) === col("text_md5"))
      .filter(col("id") =!= col("canonical_id"))
      .select(col("id"))
    val exactDeduped = scrubbed
      .join(exactLosers, Seq("id"), "left_anti").cache()
    val nExact = stageCount(exactDeduped)

    // 3: line clean
    val cleaned = Clean.lineClean(exactDeduped, "id", "text",
        cfg.minWordsPerLine)
      .join(exactDeduped.select(col("id"), col("stratum")), Seq("id"))
      .filter(col("n_kept") > 0)
      .select(col("id"), col("stratum"), col("cleaned").as("text"))
      .cache()
    val nClean = stageCount(cleaned)

    // 4: cross-doc repeated-line dedup (keep-first)
    val lineDeduped = Clean.dedupRepeatedLines(cleaned, "id", "text")
      .filter(col("n_kept") > 0)
      .join(cleaned.select(col("id"), col("stratum")), Seq("id"))
      .select(col("id"), col("stratum"), col("cleaned").as("text"))
      .cache()
    val nLineDedup = stageCount(lineDeduped)

    // 5: near-dedup — minhash → banded LSH → verified Jaccard →
    // clusters → canonical-only
    // cached: three consumers (signatures, Jaccard verify, canonical
    // filter) would each re-run the tokenize lineage otherwise
    val toks = lineDeduped.select(col("id"), col("stratum"),
      col("text"), TextFunctions.tokenize(col("text")).as("toks"))
      .cache()
    val sigs = Dedup.minhashSignatures(toks, "id", "toks", cfg.minhashK)
    val cands = Dedup.lshCandidates(sigs, cfg.lshBands, cfg.lshRows)
    val pairs = Dedup.jaccardVerify(cands, toks, "id", "toks")
      .filter(col("jaccard") >= cfg.jaccardThreshold)
    val labels = Dedup.clusters(pairs)
    val nearDeduped = Dedup.keepCanonical(toks, "id", labels).cache()
    val nNear = stageCount(nearDeduped)

    // 6: decontamination — drop docs overlapping the eval set
    val evalToks = evalDocs.select(
      TextFunctions.tokenize(col(textCol)).as("toks"))
    val contaminated = Curation.contamination(
        nearDeduped, evalToks, "id", "toks", cfg.shingleN)
      .filter(col("hit_frac") >= cfg.maxContamFrac)
      .select(col("id"))
    val decontaminated = nearDeduped
      .join(broadcast(contaminated), Seq("id"), "left_anti")
      .cache()
    val nDecontam = stageCount(decontaminated)

    // 7: deterministic stratified sampling
    val sampled = Curation.stratifiedSample(decontaminated, "id",
        "stratum", cfg.sampleRates, cfg.defaultSampleRate, cfg.sampleSalt)
      .select(col("id"), col("stratum"), col("toks"))
      .cache()
    val nSampled = stageCount(sampled)

    // 8: fixed-length sequence packing over token counts
    val sized = sampled.select(col("id"),
      size(col("toks")).cast("long").as("n_tokens"))
    val spans = Curation.packSequences(sized, "id", "n_tokens",
      cfg.seqLen).cache()
    val seqStats = spans.agg(
      countDistinct(col("seq_id")), sum(col("len"))).head()

    val report = Report(nInput, nExact, nClean, nLineDedup, nNear,
      nDecontam, nSampled,
      if (seqStats.isNullAt(0)) 0L else seqStats.getLong(0),
      if (seqStats.isNullAt(1)) 0L else seqStats.getLong(1))
    (spans, report)
  }
}
