package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Line-level corpus cleaning — the C4-style scrub + cross-document
  * boilerplate dedup stage of a web-scale training pipeline (not a
  * reference operator; builder-mandated training-data extension,
  * cf. the C4 paper's §2.1 heuristics and its three-sentence span
  * dedup).
  *
  * Scale stance:
  *  - [[lineClean]] is a pure row-local column program (split →
  *    filter → rejoin inside one codegen'd projection) — zero shuffle
  *    at any corpus size.
  *  - [[dedupRepeatedLines]] keys every shuffle on the 128-bit md5 of
  *    the line, never the raw line bytes (a 56-bit key would collide a
  *    few times per billion distinct lines — at web-corpus scale that
  *    silently drops real, non-duplicate lines; 128 bits make a chance
  *    collision astronomically unlikely): the line-frequency aggregate is
  *    algebraic (count + min — partial-agg'd map-side, so corpus-wide
  *    boilerplate lines are hot KEYS but not skewed GROUPS), and the
  *    join back to occurrences is hash → stats, broadcast-able when
  *    the duplicate set is small. Document reassembly groups by doc id
  *    — the only corpus-sized shuffle, keyed on the natural partition
  *    key.
  */
object Clean {

  /** C4 §2.1-style line rules: keep a line iff it has ≥ `minWords`
    * whitespace words, ends in terminal punctuation (optionally
    * quoted), and matches no blocklist phrase ("lorem ipsum",
    * "javascript", curly braces — the code/boilerplate tells). */
  def keepLine(l: Column, minWords: Int): Column =
    (size(split(trim(l), "\\s+")) >= minWords) &&
      trim(l).rlike("[.!?]\"?$") &&
      !lower(l).contains("lorem ipsum") &&
      !lower(l).contains("javascript") &&
      !l.contains("{")

  /** Row-local line cleanup: (id, n_lines, n_kept, cleaned). */
  def lineClean(docs: DataFrame, idCol: String, textCol: String,
                minWords: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => keepLine(l, minWords))
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("cleaned"))
  }

  /** Cross-document repeated-line dedup, keep-first: a line occurring
    * in more than one place survives only at its smallest (id, pos)
    * occurrence (C4's span-dedup semantics at line granularity).
    * Returns (id, n_kept, cleaned) with each doc's surviving lines
    * rejoined in original order. Empty lines are not dedup keys (a
    * blank separator is not boilerplate). */
  def dedupRepeatedLines(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val occ = docs.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
    // algebraic per-line-hash stats: occurrence count + first occurrence
    val stats = occ.groupBy(col("lh"))
      .agg(count(lit(1)).as("occ_n"),
        min(struct(col("__id"), col("pos"))).as("first_occ"))
    val survivors = occ.join(stats, Seq("lh"))
      .filter(col("occ_n") === 1 ||
        trim(col("line")) === "" ||
        (col("first_occ.__id") === col("__id") &&
          col("first_occ.pos") === col("pos")))
      .groupBy(col("__id"))
      .agg(count(when(trim(col("line")) =!= "", 1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("cleaned"))
    // a doc whose every line was boilerplate still exists — as empty
    docs.select(col(idCol).as("__id")).join(survivors, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  // ---- gate queries ------------------------------------------------------

  /** Injected five-line docs (the corpus text is single-line word
    * salad): one good line, one blocklisted, one without terminal
    * punctuation, one too short, one good quoted line — both engines
    * build the identical string from `text` slices. */
  private def injectedLines: Column = concat(
    substring(col("text"), 1, 60), lit(" end of part one."),
    lit("\nlorem ipsum dolor sit amet for padding purposes."),
    lit("\n"), substring(col("text"), 61, 40),
    lit("\nShort stub."),
    lit("\n"), substring(col("text"), 101, 30), lit(" closing words?\""))

  /** q80: the line-clean rules over injected docs. */
  def lineCleanGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineClean(
        Tables(spark, dir, "documents").select($"doc_id", injectedLines.as("text")),
        "doc_id", "text")
      .select($"doc_id", $"n_lines", $"n_kept", md5($"cleaned").as("cleaned_md5"))
      .orderBy($"doc_id")
  }

  private val lineCleanOracle: String = {
    val inj = "substr(text, 1, 60) || ' end of part one.'" +
      " || chr(10) || 'lorem ipsum dolor sit amet for padding purposes.'" +
      " || chr(10) || substr(text, 61, 40)" +
      " || chr(10) || 'Short stub.'" +
      " || chr(10) || substr(text, 101, 30) || ' closing words?\"'"
    // the same keep rule in DuckDB; NB trim + \s+ word split like Spark
    val keep = "len(regexp_split_to_array(trim(l), '\\s+')) >= 3" +
      " AND regexp_matches(trim(l), '[.!?]\"?$')" +
      " AND NOT contains(lower(l), 'lorem ipsum')" +
      " AND NOT contains(lower(l), 'javascript')" +
      " AND NOT contains(l, '{')"
    s"""WITH inj AS (SELECT doc_id, $inj AS t FROM documents),
       |ls AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM inj),
       |cl AS (SELECT doc_id,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    list_filter(lines, l -> $keep) AS kept FROM ls)
       |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
       |  md5(list_aggregate(kept, 'string_agg', chr(10))) AS cleaned_md5
       |FROM cl ORDER BY doc_id""".stripMargin
  }

  /** Injected three-line docs for q81: a per-doc unique line, a global
    * boilerplate footer (survives only in the minimum doc), and a
    * residue-class line shared by doc_id % 50 (survives only at each
    * class's minimum doc). */
  private def sharedLines: Column = concat(
    substring(col("text"), 1, 80), lit(" unique tail."),
    lit("\nGlobal boilerplate footer line."),
    lit("\nclass "), (col("doc_id") % 50).cast("string"),
    lit(" shared disclaimer text."))

  /** q81: cross-document keep-first dedup over the injected corpus. */
  def dedupLinesGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dedupRepeatedLines(
        Tables(spark, dir, "documents").select($"doc_id", sharedLines.as("text")),
        "doc_id", "text")
      .select($"doc_id", $"n_kept", md5($"cleaned").as("cleaned_md5"))
      .orderBy($"doc_id")
  }

  private val dedupLinesOracle: String = {
    val inj = "substr(text, 1, 80) || ' unique tail.'" +
      " || chr(10) || 'Global boilerplate footer line.'" +
      " || chr(10) || 'class ' || CAST(doc_id % 50 AS VARCHAR) || ' shared disclaimer text.'"
    s"""WITH inj AS (SELECT doc_id, $inj AS t FROM documents),
       |ls AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM inj),
       |occ AS (SELECT doc_id, CAST(u.p - 1 AS BIGINT) AS pos, lines[u.p] AS line
       |  FROM ls, unnest(range(1, len(lines) + 1)) AS u(p)),
       |stats AS (SELECT line, COUNT(*) AS occ_n,
       |    min(struct_pack(i := doc_id, p := pos)) AS first_occ
       |  FROM occ GROUP BY line),
       |keep AS (SELECT o.doc_id, o.pos, o.line FROM occ o JOIN stats s USING (line)
       |  WHERE s.occ_n = 1 OR trim(o.line) = ''
       |    OR (s.first_occ.i = o.doc_id AND s.first_occ.p = o.pos)),
       |grouped AS (SELECT doc_id,
       |    CAST(COUNT(*) FILTER (WHERE trim(line) != '') AS BIGINT) AS n_kept,
       |    string_agg(line, chr(10) ORDER BY pos) AS cleaned
       |  FROM keep GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(g.n_kept, 0) AS n_kept,
       |  md5(COALESCE(g.cleaned, '')) AS cleaned_md5
       |FROM documents d LEFT JOIN grouped g USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_line_clean" -> (lineCleanGate _),
    "q81_line_dedup" -> (dedupLinesGate _))

  val oracle: Map[String, String] = Map(
    "q80_line_clean" -> lineCleanOracle,
    "q81_line_dedup" -> dedupLinesOracle)
}
