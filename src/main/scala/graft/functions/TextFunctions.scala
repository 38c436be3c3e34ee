package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Text kernels shared by the BM25 / dedup / analysis operators.
  *
  * Each primitive exists twice, generated from ONE Scala definition:
  * as a Spark `Column` program and as a DuckDB SQL fragment (the
  * driver's oracle). That guarantees engine and oracle can't drift.
  *
  * Tokenizer semantics follow the reference's `TextPreprocessor`
  * (`src/storage/bm25_store.py:38-100`): lowercase → strip punctuation
  * (`[^\w\s]` → space) → whitespace split → drop stopwords (the
  * reference's 137-word list, `bm25_store.py:56-71`) → drop tokens
  * shorter than 2 chars.
  */
object TextFunctions {

  /** Reference stopword list, `src/storage/bm25_store.py:56-71`. */
  val stopwords: Seq[String] = Seq(
    "a", "an", "the", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "from", "up", "about", "into", "through", "during",
    "before", "after", "above", "below", "between", "under", "again",
    "further", "then", "once", "here", "there", "when", "where", "why",
    "how", "all", "each", "few", "more", "most", "other", "some", "such",
    "no", "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "can", "will", "just", "should", "now", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "having", "do", "does",
    "did", "doing", "would", "could", "might", "must", "shall", "this",
    "that", "these", "those", "i", "me", "my", "myself", "we", "our",
    "ours", "ourselves", "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself", "it",
    "its", "itself", "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom")

  private def sqlList(xs: Seq[String]): String =
    xs.mkString("['", "', '", "']")

  /** BM25 tokenizer as a Column — the single-pass codegen kernel
    * ([[TokenizeKernel]]), byte-identical to the regex column program
    * it replaced (`filter(split(regexp_replace(lower(c), "[^\w\s]",
    * " "), "\s+"), …)`; parity pinned in TokenizerBm25Spec).
    *
    * Regex-fidelity note (SURVEY §7 risk 3): Java and DuckDB-RE2 treat
    * `\w` as ASCII, while the reference's CPython `re` is Unicode-aware
    * — so "naïve" tokenizes to ["na","ve"] here but ["naïve"] in the
    * reference. Engine and oracle agree with each other on all inputs;
    * the divergence vs the reference only affects non-ASCII letters. */
  def tokenize(c: Column): Column =
    Bridge.column(Tokenize(Bridge.expression(c.cast("string"))))

  /** Same tokenizer as a DuckDB SQL fragment over column expr `col`. */
  def tokenizeSql(col: String): String =
    s"list_filter(regexp_split_to_array(regexp_replace(lower($col), '[^\\w\\s]', ' ', 'g'), '\\s+'), " +
      s"t -> length(t) >= 2 AND NOT list_contains(${sqlList(stopwords)}, t))"

  /** Porter-stemmed token column (reference `bm25_store.py:73-75`,
    * optional-off): applied AFTER stopword/length filtering, exactly
    * as the reference's TextPreprocessor orders its stages. */
  def porterStem(c: Column): Column =
    Bridge.column(PorterStem(Bridge.expression(c.cast("string"))))

  /** Tokenizer with the reference's optional stemming stage. The
    * default (stem = false) is byte-identical to [[tokenize]], keeping
    * every existing index and oracle stable. */
  def tokenize(c: Column, stem: Boolean): Column =
    if (stem) transform(tokenize(c), t => porterStem(t)) else tokenize(c)

  /** JVM twin of the stemming tokenizer. */
  def tokenizeJvm(text: String, stem: Boolean): Seq[String] =
    if (stem) tokenizeJvm(text).map(PorterStemmer.stem) else tokenizeJvm(text)

  /** Whitespace tokenizer (no stopword/length filtering) — used by the
    * quality/token-count analyses where raw words matter. Single-pass
    * kernel, byte-identical to `filter(split(trim(c), "\s+"), len>0)`
    * (parity pinned in TokenizerBm25Spec). */
  def wsTokens(c: Column): Column =
    Bridge.column(WsTokens(Bridge.expression(c.cast("string"))))

  def wsTokensSql(col: String): String =
    s"list_filter(regexp_split_to_array(trim($col), '\\s+'), t -> length(t) > 0)"

  /** Unicode NFC canonical composition (codegen kernel; DuckDB twin is
    * the built-in `nfc_normalize`). */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c.cast("string"))))

  /** C4/CCNet-style text normalization as a deterministic regex chain
    * over the NFC form — the step a multilingual pre-training pipeline
    * runs BEFORE any tokenize/hash stage so that byte-level variants of
    * the same text (decomposed accents, CRLF, control noise, tab runs)
    * collapse to one canonical form and downstream dedup keys agree:
    *   1. NFC compose;  2. CR/CRLF → LF;  3. strip C0/C1-ish control
    *   chars (keep \n, \t);  4. collapse space/tab runs to one space;
    *   5. trim spaces around newlines and at both ends.
    * Every step is a char-class regex with identical semantics in Java
    * regex and RE2, so the DuckDB twin ([[normalizeTextSql]]) is the
    * same chain verbatim. Row-local, zero shuffle. */
  def normalizeText(c: Column): Column = {
    val nfc = nfcNormalize(c)
    val lf = regexp_replace(nfc, "\\r\\n?", "\n")
    val ctrl = regexp_replace(lf, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val sp = regexp_replace(ctrl, "[ \\t]+", " ")
    val nl = regexp_replace(sp, " ?\\n ?", "\n")
    trim(nl, " \n")
  }

  /** DuckDB twin of [[normalizeText]] — same chain, same regexes. */
  def normalizeTextSql(col: String): String =
    s"""trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |nfc_normalize($col), '\\r\\n?', chr(10), 'g'),
       |'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |'[ \\t]+', ' ', 'g'), ' ?\\n ?', chr(10), 'g'), ' ' || chr(10))"""
      .stripMargin.replaceAll("\n", "")

  // ---- portable hashing -------------------------------------------------

  /** 56-bit stable hash: first 14 hex digits of md5, as a BIGINT. The
    * one hash both Spark (`conv`) and DuckDB (`'0x'||…::BIGINT`) compute
    * identically — the foundation for minhash/simhash/fingerprint
    * oracle parity. */
  def hash56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  def hash56Sql(col: String): String =
    s"(('0x' || substr(md5($col), 1, 14))::BIGINT)"

  /** JVM twin of [[hash56]] for driver-side values (query embedding,
    * id generation) — byte-identical to the column/SQL forms. */
  def hash56Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14)
    java.lang.Long.parseLong(hex, 16)
  }

  /** JVM twin of [[tokenize]] (reference `bm25_store.py:82-100`). */
  def tokenizeJvm(text: String): Seq[String] = {
    val stops = stopwords.toSet
    text.toLowerCase
      .replaceAll("[^\\w\\s]", " ")
      .split("\\s+")
      .filter(t => t.length >= 2 && !stops.contains(t))
      .toSeq
  }

  /** hash56 folded into the Mersenne-31 field (minhash universe). */
  val P31 = 2147483647L
  def hashMod(c: Column): Column = hash56(c) % P31
  def hashModSql(col: String): String = s"(${hash56Sql(col)} % 2147483647)"

  /** Word n-gram shingles ("w1 w2 w3") from a token array: one shingle
    * per start position 0..len-n (empty when len < n). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toks: String, n: Int): String =
    s"list_transform(range(greatest(len($toks) - ${n - 1}, 0)), i -> array_to_string(list_slice($toks, i + 1, i + $n), ' '))"

  // ---- language-ID word lists (n-gram/function-word heuristic) ----------

  /** Function-word lists for the language-ID heuristic. Deterministic
    * argmax with fixed priority order en > de > es > fr > zh. */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "you", "that",
      "was", "for", "on", "are", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "ich", "sie", "von", "zu", "den"),
    "es" -> Seq("el", "los", "las", "que", "y", "un", "es", "por", "del",
      "se", "con", "para"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est", "dans", "qui",
      "pour", "au", "pas", "sur"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  def langHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(words.toArray), t)))

  def langHitsSql(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> list_contains(${sqlList(words)}, t)))"
}
