package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{HierarchicalChunker, StructureDetector}

/** DuckDB-oracle gates for the ingest/domain-intelligence operators
  * (VERDICT r2 ask #2): the corpus text is flat word salad, so each
  * gate deterministically injects the structure its operator consumes
  * (headings, domain phrases, relation sentences, markdown tables) —
  * both engines build the identical string from `documents.text` via
  * SQL-expressible transforms, the Spark side runs the REAL Scala code
  * path (flatMap generators over the injected docs), and the oracle
  * derives the expected rows declaratively from the same construction.
  * This pins the operators' observable semantics end-to-end, not just
  * in ScalaTest.
  *
  * Gates here: q66 hierarchical chunking (I3+I5, reference
  * `hierarchical_chunker.py:290-547`), q67 structure detection across
  * all four pattern families (I3, `chunking_service.py:83-207`).
  */
object IngestGates {

  private val E = "\n\n"

  // ---- q66: hierarchical chunker over injected legal structure ----------

  private val H0 = "Article I: Introduction" // 23 chars, no number → level 1
  private val H1 = "Section 2.1: Scope" // 18 chars, number 2.1
  private val H2 = "Section 2.1.1: Details" // 22 chars, number 2.1.1

  /** Injected doc: three legal headings with word-salad bodies sliced
    * from `repeat(text || ' ', 16)`. Layout:
    * {{{
    *   0   H0 \n\n s1(140) \n\n        — section 0: [0, 167)
    *   167 H1 \n\n s2(280) \n\n s3(200) \n\n — section 1: [167, 671)
    *   671 H2 \n\n s4(≤140)            — section 2: [671, 695+len(s4))
    * }}}
    * The 0/167/671 offsets are constants because s1–s3 are full
    * whenever the doc text is ≥39 chars (every fixture's minimum is
    * ≥44), and each body slice's first char is overwritten with 'w'
    * so no body can start with [A-Z0-9] (the sentence-rule premise —
    * see the note at the slice construction below).
    * The TAIL slice s4 truncates below 47 chars — sf0.1 has 4
    * such docs (44–46 chars), so the last section's char_end is
    * 695+len(s4), NOT the constant 835 this gate hash-pinned until the
    * sf0.1 replay caught it (the driver's sf0.01 fixture has no doc
    * under 48 chars — a scale-revealed oracle bug, the engine side was
    * right all along).
    * Section 1's three paragraphs (heading, s2, s3) exceed the 400-char
    * paragraph budget, so the packer emits two chunks and runs the
    * 50-word-overlap carry — the word count sits right at the 50
    * boundary across docs, so BOTH overlap branches (take-all vs
    * takeRight(50)) are exercised and oracle-checked. */
  def hierChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rep = repeat(concat(col("text"), lit(" ")), 16)
    // Every body slice is FORCED to start with a lowercase letter
    // ('w' overwrites the slice's first char; lengths and therefore
    // all section offsets are unchanged). Without this the premise
    // "bodies never start with [A-Z0-9]" was only true of the driver
    // fixtures: the r15 sf1 replay caught ScaleUp's ' r<k>' text salt
    // landing a digit at offset 621, which legitimately fires the
    // chunker's `(?<=\n)\s*(?=[A-Z0-9])` sentence rule after the H2
    // heading and emits a 13th chunk the 12-row oracle can't predict.
    val injected = concat(
      lit(H0 + E), lit("w"), substring(rep, 2, 139),
      lit(E + H1 + E), lit("w"), substring(rep, 142, 279),
      lit(E), lit("w"), substring(rep, 422, 199),
      lit(E + H2 + E), lit("w"), substring(rep, 622, 139))
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), injected.as("t")).as[(Long, String)]
    val chunker = new HierarchicalChunker()
    docs.flatMap { case (id, t) =>
      chunker.chunk(t, s"doc$id").map { c =>
        (id, c.id, c.level, c.parent_id, c.chunk_index.toLong,
          c.section_title, c.section_number,
          c.char_start.map(_.toLong), c.char_end.map(_.toLong),
          c.token_count.map(_.toLong).getOrElse(0L), c.text)
      }
    }.toDF("doc_id", "id", "level", "parent_id", "chunk_index",
        "section_title", "section_number", "char_start", "char_end",
        "token_count", "text")
      .withColumn("text_md5", md5(col("text"))).drop("text")
      .orderBy(col("doc_id"), col("id"))
  }

  /** DuckDB derivation of the exact 12 chunks/doc the chunker emits:
    * 1 document + 3 sections + 4 paragraphs + 4 sentences (each
    * paragraph is one sentence — the bodies have no sentence
    * boundaries). Word-count/md5 formulas mirror the Scala
    * split-trim-pack program byte for byte. */
  private val hierOracle: String = {
    // wc(x) = count of non-empty \s+ splits — the chunker's token_count
    def wc(x: String) =
      s"CAST(len(list_filter(regexp_split_to_array($x, '\\s+'), w -> w <> '')) AS BIGINT)"
    s"""WITH d AS (SELECT doc_id, repeat(text || ' ', 16) AS rep FROM documents),
       |p AS (SELECT doc_id,
       |  'w' || substr(rep, 2, 139) AS s1, 'w' || substr(rep, 142, 279) AS s2,
       |  'w' || substr(rep, 422, 199) AS s3, 'w' || substr(rep, 622, 139) AS s4 FROM d),
       |b AS (SELECT doc_id, s1, s2, s3, s4,
       |  chr(10) || chr(10) AS e,
       |  trim(s1) AS p1, trim(s2) AS q1, trim(s3) AS q2, trim(s4) AS r1 FROM p),
       |t AS (SELECT *,
       |  '$H0' || e || s1 || e || '$H1' || e || s2 || e || s3 || e || '$H2' || e || s4 AS full_text,
       |  '$H0' || e || rtrim(s1) AS sec0,
       |  '$H1' || e || s2 || e || rtrim(s3) AS sec1,
       |  '$H2' || e || rtrim(s4) AS sec2,
       |  '$H0' || e || p1 AS para00,
       |  '$H1' || e || q1 AS para10,
       |  '$H2' || e || r1 AS para20 FROM b),
       |w AS (SELECT *,
       |  list_filter(regexp_split_to_array(para10, '\\s+'), x -> x <> '') AS wtoks FROM t),
       |f AS (SELECT *,
       |  array_to_string(
       |    CASE WHEN len(wtoks) > 50
       |         THEN list_slice(wtoks, len(wtoks) - 49, len(wtoks))
       |         ELSE wtoks END, ' ') || ' ' || q2 AS para11 FROM w),
       |rows_ AS (
       |  SELECT doc_id, 'doc' || doc_id || '_doc' AS id, 'document' AS level,
       |    CAST(NULL AS VARCHAR) AS parent_id, CAST(0 AS BIGINT) AS chunk_index,
       |    CAST(NULL AS VARCHAR) AS section_title, CAST(NULL AS VARCHAR) AS section_number,
       |    CAST(NULL AS BIGINT) AS char_start, CAST(NULL AS BIGINT) AS char_end,
       |    ${wc("full_text")} AS token_count, md5(full_text) AS text_md5 FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_0', 'section',
       |    'doc' || doc_id || '_doc', 0, '$H0', NULL, 0, 167,
       |    ${wc("sec0")}, md5(sec0) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_1', 'section',
       |    'doc' || doc_id || '_doc', 1, '$H1', '2.1', 167, 671,
       |    ${wc("sec1")}, md5(sec1) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_2', 'section',
       |    'doc' || doc_id || '_doc', 2, '$H2', '2.1.1', 671,
       |    CAST(695 + len(s4) AS BIGINT),
       |    ${wc("sec2")}, md5(sec2) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_0_para_0', 'paragraph',
       |    'doc' || doc_id || '_sec_0', 0, '$H0', NULL, NULL, NULL,
       |    ${wc("para00")}, md5(para00) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_1_para_0', 'paragraph',
       |    'doc' || doc_id || '_sec_1', 0, '$H1', NULL, NULL, NULL,
       |    ${wc("para10")}, md5(para10) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_1_para_1', 'paragraph',
       |    'doc' || doc_id || '_sec_1', 1, '$H1', NULL, NULL, NULL,
       |    ${wc("para11")}, md5(para11) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_2_para_0', 'paragraph',
       |    'doc' || doc_id || '_sec_2', 0, '$H2', NULL, NULL, NULL,
       |    ${wc("para20")}, md5(para20) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_0_para_0_sent_0', 'sentence',
       |    'doc' || doc_id || '_sec_0_para_0', 0, '$H0', NULL, NULL, NULL,
       |    ${wc("para00")}, md5(para00) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_1_para_0_sent_0', 'sentence',
       |    'doc' || doc_id || '_sec_1_para_0', 0, '$H1', NULL, NULL, NULL,
       |    ${wc("para10")}, md5(para10) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_1_para_1_sent_0', 'sentence',
       |    'doc' || doc_id || '_sec_1_para_1', 0, '$H1', NULL, NULL, NULL,
       |    ${wc("para11")}, md5(para11) FROM f
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_sec_2_para_0_sent_0', 'sentence',
       |    'doc' || doc_id || '_sec_2_para_0', 0, '$H2', NULL, NULL, NULL,
       |    ${wc("para20")}, md5(para20) FROM f)
       |SELECT * FROM rows_ ORDER BY doc_id, id""".stripMargin
  }

  // ---- q67: structure detection across the four pattern families --------

  /** Rotates doc_id % 4 through the legal / technical / building-code /
    * financial pattern families with two family-specific headings per
    * doc (one numbered, one not — pinning `nestingLevel` and the
    * number-extraction regex), bodies sliced from the doc's own text.
    * Layout: hA \n\n body1(150) \n\n hB \n\n body2(150). */
  def sections(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = col("doc_id") % 4
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val hA = when(f === 0, concat(lit("Clause "), s((col("doc_id") % 9) + 1),
        lit("."), s(col("doc_id") % 5), lit(": Obligations")))
      .when(f === 1, concat(lit("Chapter "), s(col("doc_id") % 90), lit(": Design")))
      .when(f === 2, concat(lit("§ "), s((col("doc_id") % 900) + 100),
        lit("."), s(col("doc_id") % 10), lit(" fire egress")))
      .otherwise(lit("Balance Sheet"))
    val hB = when(f === 0, lit("(a) subsequent obligations"))
      .when(f === 1, lit("Part B: Assembly"))
      .when(f === 2, concat(lit("IBC "), s((col("doc_id") % 100) + 1000), lit(".1")))
      .otherwise(concat(lit("Q"), s((col("doc_id") % 4) + 1), lit(" "),
        s((col("doc_id") % 5) + 2020)))
    val docType = when(f === 0, "contract").when(f === 1, "technical")
      .when(f === 2, "building_code").otherwise("financial_report")
    val rep = repeat(concat(col("text"), lit(" ")), 8)
    val injected = concat(hA, lit(E), substring(rep, 1, 150),
      lit(E), hB, lit(E), substring(rep, 151, 150))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), injected.as("t"), docType.as("dt"))
      .as[(Long, String, String)]
      .flatMap { case (id, t, dt) =>
        StructureDetector.detect(t, dt).zipWithIndex.map { case (s, i) =>
          (id, i.toLong, s.title, s.number, s.level.toLong,
            s.lineNumber.toLong, s.start.toLong, s.end.toLong)
        }
      }
      .toDF("doc_id", "sec_idx", "title", "number", "level",
        "line_number", "char_start", "char_end")
      .orderBy(col("doc_id"), col("sec_idx"))
  }

  private val sectionsOracle: String =
    s"""WITH h AS (SELECT doc_id, doc_id % 4 AS f,
       |  CASE doc_id % 4
       |    WHEN 0 THEN 'Clause ' || (doc_id % 9 + 1) || '.' || (doc_id % 5) || ': Obligations'
       |    WHEN 1 THEN 'Chapter ' || (doc_id % 90) || ': Design'
       |    WHEN 2 THEN chr(167) || ' ' || (doc_id % 900 + 100) || '.' || (doc_id % 10) || ' fire egress'
       |    ELSE 'Balance Sheet' END AS ha,
       |  CASE doc_id % 4
       |    WHEN 0 THEN '(a) subsequent obligations'
       |    WHEN 1 THEN 'Part B: Assembly'
       |    WHEN 2 THEN 'IBC ' || (doc_id % 100 + 1000) || '.1'
       |    ELSE 'Q' || (doc_id % 4 + 1) || ' ' || (doc_id % 5 + 2020) END AS hb,
       |  CASE doc_id % 4
       |    WHEN 0 THEN (doc_id % 9 + 1) || '.' || (doc_id % 5)
       |    WHEN 1 THEN CAST(doc_id % 90 AS VARCHAR)
       |    WHEN 2 THEN (doc_id % 900 + 100) || '.' || (doc_id % 10)
       |    ELSE NULL END AS num_a,
       |  CASE doc_id % 4
       |    WHEN 0 THEN NULL
       |    WHEN 1 THEN NULL
       |    WHEN 2 THEN (doc_id % 100 + 1000) || '.1'
       |    ELSE CAST(doc_id % 4 + 1 AS VARCHAR) END AS num_b
       |  FROM documents),
       |l AS (SELECT *,
       |  CASE f WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 1 END AS lvl_a,
       |  CASE f WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 1 END AS lvl_b,
       |  CAST(length(ha) + 154 AS BIGINT) AS hb_start,
       |  CAST(length(ha) + length(hb) + 306 AS BIGINT) AS text_len FROM h)${""
    /* fixture-length premise (the q66 class): 154 = E+s1(150)+E and 306
     * additionally assumes s2(150) is full — true iff the 8×-repeated
     * rope covers 300 chars, i.e. doc text ≥ 38 chars. Every fixture's
     * minimum is 44 (sf0.1; 47/48 at smaller sfs), and ScaleUp
     * replicates rows, so the premise is scale-invariant. q66's s4
     * needed ≥47 and broke at sf0.1 — if documents ever get shorter,
     * THIS pair is the next to derive from len() instead. */}
       |SELECT doc_id, CAST(0 AS BIGINT) AS sec_idx, ha AS title, num_a AS number,
       |  CAST(lvl_a AS BIGINT) AS level, CAST(0 AS BIGINT) AS line_number,
       |  CAST(0 AS BIGINT) AS char_start, hb_start AS char_end FROM l
       |UNION ALL
       |SELECT doc_id, 1, hb, num_b, CAST(lvl_b AS BIGINT), 4, hb_start, text_len FROM l
       |ORDER BY doc_id, sec_idx""".stripMargin

  // ---- q68: domain metadata extraction (I7/A14) --------------------------

  /** Rotates doc_id % 4 through the four domain extractors via the
    * ROUTER (no type hint): injects a family blob with residue-keyed
    * variations (subtype keyword counts → confidence tiers, optional
    * parties/terms/categories), prepended to the doc body. Every
    * contains()/regex consequence — including the faithful
    * `"data" ⊃ "ada"` building-code substring quirk — is derived by the
    * oracle from the same constructed text. */
  def domainTags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val state = when(d % 3 === 0, "Delaware").when(d % 3 === 1, "New York")
      .otherwise("California")
    val contractBlob = concat(
      lit("PRIMARY SERVICES AGREEMENT\nbetween Acme Corp and others.\n"),
      when(d % 2 === 0, "Parties: Delta Industries.\n").otherwise(""),
      lit("The parties agree to indemnification and termination terms.\n"),
      when(d % 3 >= 1, "This service contract applies.\n").otherwise(""),
      when(d % 3 === 2, "professional services rendered.\n").otherwise(""),
      when(d % 2 === 1, "warranty and arbitration apply.\n").otherwise(""),
      when(d % 5 === 0, "confidentiality obligations persist.\n").otherwise(""),
      lit("governed by the laws of the State of "), state,
      lit(". Fee of $"), s(d + 1000), lit(".00 per month."),
      when(d % 2 === 0, " Deposit $500.").otherwise(""))
    val taxBlob = concat(
      lit("Internal Revenue tax code guidance under IRC Section "),
      s(d % 800 + 100), lit("(a) and Treasury Regulation notes."),
      lit(" See also Section "), s(d % 50 + 200), lit(" rules."),
      lit(" File Form "), s(d % 100 + 1000), lit("-EZ today."),
      lit(" Income tax and taxable income apply."),
      when(d % 2 === 0, " Deduction and credit allowed.").otherwise(""),
      when(d % 3 === 0, " Revenue ruling 55 applies.").otherwise(""))
    val buildingBlob = concat(
      lit("International Building Code IBC requires fire sprinkler systems " +
        "and egress capacity per occupancy limits."),
      when(d % 2 === 1, " Structural foundation and seismic design required.")
        .otherwise(""),
      when(d % 3 === 1, " HVAC ventilation ducts included.").otherwise(""))
    val finBlob = concat(
      when(d % 2 === 0, "Quarterly report and ").otherwise("Periodic filing with "),
      lit("Form 10-Q earnings release for the fiscal year."),
      lit(" Revenue and net income and cash flow improved."),
      when(d % 3 === 2,
        " Gross margin and operating income grew with earnings per share.")
        .otherwise(""))
    val injected = concat(
      when(d % 4 === 0, contractBlob).when(d % 4 === 1, taxBlob)
        .when(d % 4 === 2, buildingBlob).otherwise(finBlob),
      lit("\n"), col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), injected.as("t")).as[(Long, String)]
      .map { case (id, t) =>
        val e = graft.ingest.DomainMetadata.extract(t)
        (id, e.documentType, e.documentSubtype, e.confidence, e.title,
          e.parties.mkString(","), e.keyTerms.mkString(","),
          e.references.mkString(","),
          e.filterTags.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(";"))
      }
      .toDF("doc_id", "document_type", "document_subtype", "confidence",
        "title", "parties", "key_terms", "refs", "tags")
      .orderBy(col("doc_id"))
  }

  private val domainOracle: String =
    s"""WITH b AS (SELECT doc_id, text, doc_id % 4 AS f,
       |  contains(text, 'ada') AS has_ada,
       |  CASE doc_id % 3 WHEN 0 THEN 'Delaware' WHEN 1 THEN 'New York'
       |    ELSE 'California' END AS state,
       |  1 + CASE WHEN doc_id % 3 >= 1 THEN 1 ELSE 0 END
       |    + CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END AS csubn,
       |  (doc_id % 800 + 100) || '(a),' || (doc_id % 50 + 200) AS irc_secs,
       |  (doc_id % 100 + 1000) || '-EZ' AS tax_form,
       |  CASE WHEN doc_id % 2 = 0 THEN 'deductions,income_tax'
       |    ELSE 'income_tax' END AS tax_cats
       |  FROM documents),
       |c AS (SELECT *,
       |  CASE WHEN has_ada THEN 'ada,ibc' ELSE 'ibc' END AS codes,
       |  CASE WHEN has_ada THEN 'accessibility,' ELSE '' END || 'fire_safety'
       |    || CASE WHEN doc_id % 3 = 1 THEN ',mechanical' ELSE '' END
       |    || ',occupancy'
       |    || CASE WHEN doc_id % 2 = 1 THEN ',structural' ELSE '' END AS bcats,
       |  'revenue,net income'
       |    || CASE WHEN doc_id % 3 = 2 THEN ',gross margin,operating income' ELSE '' END
       |    || ',cash flow'
       |    || CASE WHEN doc_id % 3 = 2 THEN ',earnings per share' ELSE '' END AS fmetrics
       |  FROM b)
       |SELECT doc_id,
       |  CASE f WHEN 0 THEN 'contract' WHEN 1 THEN 'irc_code'
       |    WHEN 2 THEN 'building_code' ELSE 'financial_report' END AS document_type,
       |  CASE f WHEN 0 THEN 'service_agreement'
       |    WHEN 1 THEN (CASE WHEN doc_id % 2 = 0 THEN 'deductions' ELSE 'income_tax' END)
       |    WHEN 2 THEN (CASE WHEN has_ada THEN 'ada' ELSE 'ibc' END)
       |    ELSE '10-q' END AS document_subtype,
       |  CASE f
       |    WHEN 0 THEN least(CAST(1 AS DOUBLE), CAST(csubn AS DOUBLE) / CAST(3 AS DOUBLE))
       |    WHEN 1 THEN CAST(0.8 AS DOUBLE)
       |    WHEN 2 THEN CAST(0.8 AS DOUBLE)
       |    ELSE (CASE WHEN doc_id % 2 = 0 THEN CAST(1 AS DOUBLE)
       |      ELSE CAST(2 AS DOUBLE) / CAST(3 AS DOUBLE) END) END AS confidence,
       |  CASE WHEN f = 0 THEN 'PRIMARY SERVICES AGREEMENT' ELSE NULL END AS title,
       |  CASE WHEN f = 0 THEN 'Acme Corp'
       |    || (CASE WHEN doc_id % 2 = 0 THEN ',Delta Industries' ELSE '' END)
       |    ELSE '' END AS parties,
       |  CASE f
       |    WHEN 0 THEN 'indemnification,termination'
       |      || (CASE WHEN doc_id % 2 = 1 THEN ',arbitration' ELSE '' END)
       |      || (CASE WHEN doc_id % 5 = 0 THEN ',confidentiality' ELSE '' END)
       |      || (CASE WHEN doc_id % 2 = 1 THEN ',warranty' ELSE '' END)
       |    WHEN 1 THEN tax_cats
       |    WHEN 2 THEN bcats
       |    ELSE fmetrics END AS key_terms,
       |  CASE f WHEN 0 THEN ''
       |    WHEN 1 THEN irc_secs || ',' || tax_form
       |    WHEN 2 THEN codes
       |    ELSE '' END AS refs,
       |  CASE f
       |    WHEN 0 THEN 'contract_type=service_agreement;governing_law=' || state
       |      || ';has_arbitration=' || (CASE WHEN doc_id % 2 = 1 THEN 'true' ELSE 'false' END)
       |      || ';has_confidentiality=' || (CASE WHEN doc_id % 5 = 0 THEN 'true' ELSE 'false' END)
       |      || ';has_indemnification=true;has_non_compete=false'
       |      || ';has_termination_clause=true'
       |      || ';monetary_values=' || (doc_id + 1000) || '.00'
       |      || (CASE WHEN doc_id % 2 = 0 THEN ',500' ELSE '' END)
       |    WHEN 1 THEN 'irc_sections=' || irc_secs
       |      || ';is_guidance=' || (CASE WHEN doc_id % 3 = 0 THEN 'true' ELSE 'false' END)
       |      || ';is_regulation=true;tax_categories=' || tax_cats
       |      || ';tax_forms=' || tax_form
       |    WHEN 2 THEN 'building_categories=' || bcats || ';code_types=' || codes
       |    ELSE 'financial_metrics=' || fmetrics || ';report_type=10-q' END AS tags
       |FROM c ORDER BY doc_id""".stripMargin

  // ---- q69: relationship extraction + two-pass resolution (I8/A13/U2) ----

  /** Injects one sentence per relation family on interleaved residue
    * classes (amends / references / exhibits / supersedes / cites /
    * long-match references / incorporates), runs the real extract +
    * resolve passes, and pins refs, types, confidence arithmetic (base
    * .7/.9, the −.2 long-match deduction in IEEE double), the
    * first-writer dedup of the double-matching exhibit sentence (U2),
    * and containment-based resolution with the longest-identifier
    * tie-break. */
  def relations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val rep = repeat(concat(col("text"), lit(" ")), 8)
    val injected = concat(
      when(d % 3 === 0, "This amendment to Master Agreement applies. ").otherwise(""),
      when(d % 4 === 0, "Delivered pursuant to Section 12 of the Master Terms. ").otherwise(""),
      when(d % 5 === 0, concat(lit("See Exhibit "),
        lit("ABCDEF").substr(((d % 6) + 1).cast("int"), lit(1)),
        lit(" to this filing. "))).otherwise(lit("")),
      when(d % 6 === 0, "This supersedes all prior versions thereof. ").otherwise(""),
      when(d % 7 === 0, concat(lit("Authorized under IRC § "), s(d % 400 + 100),
        lit("(b) rules. "))).otherwise(lit("")),
      when(d % 8 === 0, concat(lit("Provided in accordance with the "),
        substring(rep, 1, 200), lit(" annex. "))).otherwise(lit("")),
      when(d % 9 === 0, concat(lit("Terms incorporated herein by reference Schedule "),
        s(d % 5 + 1), lit(" fully. "))).otherwise(lit("")),
      col("text"))
    val idents = Seq("Master Agreement" -> "doc_master", "Section 12" -> "doc_sec12")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), injected.as("t")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val rels = graft.ingest.RelationshipExtractor.extract(t, s"doc$id")
        graft.ingest.RelationshipExtractor.resolve(rels, idents).map { r =>
          (id, r.source_id, r.target_id, r.relation_type, r.confidence,
            r.raw_reference)
        }
      }
      .toDF("doc_id", "source_id", "target_id", "relation_type",
        "confidence", "raw_reference")
      .orderBy(col("doc_id"), col("relation_type"), col("raw_reference"))
  }

  private val relationsOracle: String =
    s"""WITH d AS (SELECT doc_id, repeat(text || ' ', 8) AS rep FROM documents),
       |rows_ AS (
       |  SELECT doc_id, 'doc' || doc_id AS source_id, 'doc_master' AS target_id,
       |    'amends' AS relation_type, CAST(0.7 AS DOUBLE) AS confidence,
       |    'Master Agreement' AS raw_reference
       |  FROM d WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id, 'doc' || doc_id, 'doc_sec12', 'references',
       |    CAST(0.7 AS DOUBLE), 'Section 12 of the Master Terms'
       |  FROM d WHERE doc_id % 4 = 0
       |  UNION ALL SELECT doc_id, 'doc' || doc_id,
       |    'unresolved:' || substr('ABCDEF', CAST(doc_id % 6 AS INT) + 1, 1),
       |    'exhibits_to', CAST(0.9 AS DOUBLE),
       |    substr('ABCDEF', CAST(doc_id % 6 AS INT) + 1, 1)
       |  FROM d WHERE doc_id % 5 = 0
       |  UNION ALL SELECT doc_id, 'doc' || doc_id, 'unresolved:versions thereof',
       |    'supersedes', CAST(0.7 AS DOUBLE), 'versions thereof'
       |  FROM d WHERE doc_id % 6 = 0
       |  UNION ALL SELECT doc_id, 'doc' || doc_id,
       |    'unresolved:' || (doc_id % 400 + 100) || '(b)', 'cites',
       |    CAST(0.9 AS DOUBLE), (doc_id % 400 + 100) || '(b)'
       |  FROM d WHERE doc_id % 7 = 0
       |  UNION ALL SELECT doc_id, 'doc' || doc_id,
       |    'unresolved:the ' || substr(rep, 1, 200) || ' annex', 'references',
       |    CAST(0.7 AS DOUBLE) - CAST(0.2 AS DOUBLE),
       |    'the ' || substr(rep, 1, 200) || ' annex'
       |  FROM d WHERE doc_id % 8 = 0
       |  UNION ALL SELECT doc_id, 'doc' || doc_id,
       |    'unresolved:Schedule ' || (doc_id % 5 + 1) || ' fully', 'incorporates',
       |    CAST(0.7 AS DOUBLE), 'Schedule ' || (doc_id % 5 + 1) || ' fully'
       |  FROM d WHERE doc_id % 9 = 0)
       |SELECT * FROM rows_ ORDER BY doc_id, relation_type, raw_reference""".stripMargin

  // ---- q70: table detection/parsing + dual chunks (I6/A9/A10) ------------

  /** Appends a markdown table after the body — a 4-column money table
    * on even docs (classified financial via the header-keyword
    * fallback: its cell-type ratios sit under both the 0.5
    * currency+number and 0.2 date thresholds, the faithful
    * all-cells-include-header quirk) and a 3-column status table on odd
    * docs (boolean ratio 0.25 > 0.2 → compliance). Pins detection
    * offsets, the line-consistency confidence in IEEE double, cell
    * typing, and both structured/semantic chunk texts. */
  def tableExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val day = lpad(s(d % 28 + 1), 2, "0")
    val tbl0 = concat(
      lit("| item | amount | growth | when |\n"),
      lit("| alpha | $1,200.00 | 12.5% | 01/"), day, lit("/2024 |\n"),
      lit("| beta | $"), s(d + 1000), lit(".00 | 8.0% | 02/10/2024 |\n"),
      lit("| gamma | $900.50 | 3.2% | 03/05/2024 |"))
    val tbl1 = lit("| task | status | owner |\n| alpha | yes | bob |\n" +
      "| beta | no | carl |\n| gamma | true | dana |")
    val injected = concat(col("text"), lit("\n"),
      when(d % 2 === 0, tbl0).otherwise(tbl1))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), injected.as("t")).as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.ingest.TableExtractor.extractTables(t, s"doc$id").flatMap { tab =>
          Seq((id, s"${tab.id}_structured", "table_structured", 0L,
              tab.tableType, tab.headers.mkString(","), tab.numRows.toLong,
              tab.numCols.toLong, tab.charStart.toLong, tab.charEnd.toLong,
              tab.confidence, tab.structuredText),
            (id, s"${tab.id}_semantic", "table_semantic", 1L,
              tab.tableType, tab.headers.mkString(","), tab.numRows.toLong,
              tab.numCols.toLong, tab.charStart.toLong, tab.charEnd.toLong,
              tab.confidence, tab.semanticDescription))
        }
      }
      .toDF("doc_id", "chunk_id", "element_type", "chunk_index", "table_type",
        "headers", "num_rows", "num_cols", "char_start", "char_end",
        "confidence", "text")
      .withColumn("text_md5", md5(col("text"))).drop("text")
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val tablesOracle: String =
    s"""WITH b AS (SELECT doc_id, text,
       |  lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS day FROM documents),
       |t AS (SELECT *,
       |  CASE WHEN doc_id % 2 = 0 THEN
       |    '| item | amount | growth | when |' || chr(10) ||
       |    '| alpha | $$1,200.00 | 12.5% | 01/' || day || '/2024 |' || chr(10) ||
       |    '| beta | $$' || (doc_id + 1000) || '.00 | 8.0% | 02/10/2024 |' || chr(10) ||
       |    '| gamma | $$900.50 | 3.2% | 03/05/2024 |'
       |  ELSE
       |    '| task | status | owner |' || chr(10) || '| alpha | yes | bob |' || chr(10) ||
       |    '| beta | no | carl |' || chr(10) || '| gamma | true | dana |'
       |  END AS tbl,
       |  CASE WHEN doc_id % 2 = 0 THEN 'financial' ELSE 'compliance' END AS ttype,
       |  CASE WHEN doc_id % 2 = 0 THEN 'item,amount,growth,when'
       |    ELSE 'task,status,owner' END AS hdrs,
       |  CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS ncols,
       |  CASE WHEN doc_id % 2 = 0 THEN
       |    '"item","amount","growth","when"' || chr(10) ||
       |    '"item","amount","growth","when"' || chr(10) ||
       |    '"alpha","$$1,200.00","12.5%","01/' || day || '/2024"' || chr(10) ||
       |    '"beta","$$' || (doc_id + 1000) || '.00","8.0%","02/10/2024"' || chr(10) ||
       |    '"gamma","$$900.50","3.2%","03/05/2024"'
       |  ELSE
       |    '"task","status","owner"' || chr(10) || '"task","status","owner"' || chr(10) ||
       |    '"alpha","yes","bob"' || chr(10) || '"beta","no","carl"' || chr(10) ||
       |    '"gamma","true","dana"'
       |  END AS structured,
       |  CASE WHEN doc_id % 2 = 0 THEN
       |    'This is a financial data table with monetary values. ' ||
       |    'Columns: item, amount, growth, when. Contains 3 data rows. ' ||
       |    'Sample row: item: alpha, amount: $$1,200.00, growth: 12.5%, when: 01/' ||
       |    day || '/2024.'
       |  ELSE
       |    'This is a compliance or status tracking table. ' ||
       |    'Columns: task, status, owner. Contains 3 data rows. ' ||
       |    'Sample row: task: alpha, status: yes, owner: bob.'
       |  END AS semantic
       |  FROM b),
       |u AS (SELECT doc_id, 'doc' || doc_id || '_table_0_structured' AS chunk_id,
       |    'table_structured' AS element_type, CAST(0 AS BIGINT) AS chunk_index,
       |    ttype AS table_type, hdrs AS headers, CAST(4 AS BIGINT) AS num_rows,
       |    CAST(ncols AS BIGINT) AS num_cols,
       |    CAST(length(text) + 1 AS BIGINT) AS char_start,
       |    CAST(length(text) + 1 + length(tbl) AS BIGINT) AS char_end,
       |    CAST(0.5 AS DOUBLE) + 4 * CAST(0.05 AS DOUBLE) AS confidence,
       |    md5(structured) AS text_md5 FROM t
       |  UNION ALL SELECT doc_id, 'doc' || doc_id || '_table_0_semantic',
       |    'table_semantic', 1, ttype, hdrs, 4, CAST(ncols AS BIGINT),
       |    CAST(length(text) + 1 AS BIGINT),
       |    CAST(length(text) + 1 + length(tbl) AS BIGINT),
       |    CAST(0.5 AS DOUBLE) + 4 * CAST(0.05 AS DOUBLE), md5(semantic) FROM t)
       |SELECT * FROM u ORDER BY doc_id, chunk_id""".stripMargin

  // ---- q92: html→text extraction (S1 parser seam, round 6) --------------

  /** Injection gate for [[graft.ingest.DocumentParser.HtmlParser]]:
    * every document wraps into a deterministic HTML page (style +
    * script noise with a `<` inside, an h1, a comment, entities, a
    * list), the Spark side runs the REAL JVM parser per row (the same
    * code path the upload route and `binaryFile` scan use), and the
    * oracle replays the strip chain step-for-step in DuckDB regexes —
    * so the gate pins block removal, heading→markdown, block-closer
    * newlines, tag stripping, entity decode, and whitespace collapse
    * against an independent engine, not just ScalaTest. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val html = concat(
      lit("<html><head><style>p { color: #888; }</style>" +
        "<script>var x = 1 < 2;</script></head><body><h1>Doc "),
      col("doc_id"),
      lit("</h1><!-- generated --><p>"), col("text"),
      lit(" &amp; more</p><ul><li>alpha</li><li>beta</li></ul></body></html>"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), html.as("h")).as[(Long, String)]
      .map { case (id, h) =>
        (id, graft.ingest.DocumentParser.HtmlParser.parse(h.getBytes("UTF-8")).text)
      }
      .toDF("doc_id", "parsed")
      .orderBy("doc_id")
  }

  /** The HtmlParser strip chain, one CTE per stage. Only the h1 rule
    * can match the constructed input, so the h2..h6 passes are
    * no-ops and elided; entity replacements run in the parser's order
    * (amp LAST, so `&amp;lt;` would decode like the JVM side). The
    * final trim strips spaces/newlines/tabs/CRs — Java `trim`'s
    * ≤U+0020 rule restricted to the characters this input can
    * produce. */
  private val htmlOracle: String =
    """WITH src AS (SELECT doc_id,
      |  '<html><head><style>p { color: #888; }</style><script>var x = 1 < 2;</script></head><body><h1>Doc '
      |  || doc_id || '</h1><!-- generated --><p>' || text ||
      |  ' &amp; more</p><ul><li>alpha</li><li>beta</li></ul></body></html>' AS h
      |  FROM documents),
      |s1 AS (SELECT doc_id, regexp_replace(regexp_replace(h,
      |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |    '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS h FROM src),
      |s2 AS (SELECT doc_id, regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(h, '(?is)<h1[^>]*>(.*?)</h1>',
      |    chr(10) || '# \1' || chr(10), 'g') AS h FROM s2),
      |s4 AS (SELECT doc_id, regexp_replace(h,
      |    '(?i)<(br|/p|/div|/li|/tr|/ul|/ol|/table)[^>]*>', chr(10), 'g') AS h FROM s3),
      |s5 AS (SELECT doc_id, regexp_replace(h, '(?s)<[^>]+>', ' ', 'g') AS h FROM s4),
      |s6 AS (SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(h,
      |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |      '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS h FROM s5),
      |s7 AS (SELECT doc_id, list_aggregate(list_transform(
      |    string_split(h, chr(10)),
      |    l -> trim(regexp_replace(l, '[ \t\x0B\f\r]+', ' ', 'g'))),
      |    'string_agg', chr(10)) AS h FROM s6),
      |s8 AS (SELECT doc_id, trim(regexp_replace(h,
      |    chr(10) || '{3,}', chr(10) || chr(10), 'g'),
      |    ' ' || chr(10) || chr(9) || chr(13)) AS h FROM s7)
      |SELECT doc_id, h AS parsed FROM s8 ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_hier_chunks" -> (hierChunks _),
    "q67_sections" -> (sections _),
    "q68_domain_tags" -> (domainTags _),
    "q69_relations" -> (relations _),
    "q70_table_extract" -> (tableExtract _),
    "q92_html_extract" -> (htmlExtract _))

  val oracle: Map[String, String] = Map(
    "q66_hier_chunks" -> hierOracle,
    "q67_sections" -> sectionsOracle,
    "q68_domain_tags" -> domainOracle,
    "q69_relations" -> relationsOracle,
    "q70_table_extract" -> tablesOracle,
    "q92_html_extract" -> htmlOracle)
}
