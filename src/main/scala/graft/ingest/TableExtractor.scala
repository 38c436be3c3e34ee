package graft.ingest

import java.util.regex.Pattern

import graft.model.UnifiedChunk

/** Table detection + parsing (I6, reference
  * `src/tables/table_extractor.py:74-673`): line-consistency detection
  * (≥3 table-ish lines, column-count variance < 2), delimiter inference
  * (pipe / tab / multi-space), header = first row, per-cell type
  * classification (currency/percentage/date/number/boolean/text),
  * table-type rules (financial ≥.5 currency+number; compliance ≥.2
  * boolean; schedule ≥.2 date; header-keyword fallback), and TWO chunks
  * per table — `_structured` CSV-ish + `_semantic` NL description
  * (`:631-673`).
  */
object TableExtractor {

  case class Cell(value: String, row: Int, col: Int, dataType: String)

  case class ExtractedTable(
      id: String,
      document_id: String,
      rows: Seq[Seq[Cell]], // includes the header row (reference keeps it)
      numRows: Int,
      numCols: Int,
      headers: Seq[String],
      tableType: String,
      title: Option[String],
      structuredText: String,
      semanticDescription: String,
      charStart: Int,
      charEnd: Int,
      confidence: Double)

  private val borderLine = Pattern.compile("""^[\s\-|+]+$""")
  // precompiled per-line/per-cell patterns: String.split(regex) and
  // String.matches re-compile on every call, and these run per LINE /
  // per CELL of every scanned document (guide §1.2 step 2)
  private val ws3 = Pattern.compile("""\s{3,}""")
  private val ws2 = Pattern.compile("""\s{2,}""")
  private val currencyCell = Pattern.compile("""^\$[\d,]+(?:\.\d{2})?$""")
  private val percentCell = Pattern.compile("""^[\d,]+(?:\.\d+)?%$""")
  private val dateCell = Pattern.compile("""^\d{1,2}[/-]\d{1,2}[/-]\d{2,4}$""")
  private val numberCell = Pattern.compile("""^[\d,]+(?:\.\d+)?$""")
  private val titlePattern =
    Pattern.compile("""(Table\s+\d+[:.]\s*[^\n]+)""", Pattern.CASE_INSENSITIVE)

  /** `table_extractor.py:171-199`: a line looks table-ish. */
  private def isTableLine(line: String): Boolean = {
    if (line.count(_ == '|') >= 2) return true
    if (line.count(_ == '\t') >= 1 && line.split("\t").count(_.trim.nonEmpty) >= 2)
      return true
    if (ws3.split(line.trim).count(_.nonEmpty) >= 3) return true
    borderLine.matcher(line).matches()
  }

  /** `table_extractor.py:245-249`. */
  private def countColumns(line: String): Int =
    if (line.contains("|")) line.split("\\|").count(_.trim.nonEmpty)
    else if (line.contains("\t")) line.split("\t").count(_.trim.nonEmpty)
    else ws2.split(line.trim).count(_.nonEmpty)

  /** Line-analysis table detection (A10, `table_extractor.py:203-241`):
    * runs of table-ish lines with column-count variance < 2. */
  def detect(text: String): Seq[(Int, Int, String, Double)] = {
    val lines = text.split("\n", -1)
    val found = Seq.newBuilder[(Int, Int, String, Double)]
    var i = 0
    while (i < lines.length) {
      if (isTableLine(lines(i))) {
        val startLine = i
        val colCounts = Seq.newBuilder[Int]
        while (i < lines.length && (isTableLine(lines(i)) || lines(i).trim.isEmpty)) {
          if (lines(i).trim.nonEmpty) colCounts += countColumns(lines(i))
          i += 1
        }
        val counts = colCounts.result()
        if (counts.length >= 3) {
          val avg = counts.sum.toDouble / counts.length
          val variance = counts.map(c => (c - avg) * (c - avg)).sum / counts.length
          if (variance < 2) {
            val tableText = lines.slice(startLine, i).mkString("\n")
            val tableStart = lines.take(startLine).map(_.length + 1).sum
            val confidence = math.min(0.9, 0.5 + counts.length * 0.05)
            found += ((tableStart, tableStart + tableText.length, tableText, confidence))
          }
        }
      } else i += 1
    }
    found.result()
  }

  /** `table_extractor.py:428-443`: per-cell data-type classification. */
  def classifyCell(raw: String): String = {
    val v = raw.trim
    if (currencyCell.matcher(v).matches()) "currency"
    else if (percentCell.matcher(v).matches()) "percentage"
    else if (dateCell.matcher(v).matches()) "date"
    else if (numberCell.matcher(v).matches()) "number"
    else if (Seq("yes", "no", "true", "false", "✓", "✗", "x").contains(v.toLowerCase)) "boolean"
    else "text"
  }

  /** `table_extractor.py:355-366`: delimiter inference. */
  def detectDelimiter(text: String): String = {
    val lines = text.trim.split("\n")
    val pipes = text.count(_ == '|')
    val tabs = text.count(_ == '\t')
    if (pipes > lines.length) "|"
    else if (tabs > lines.length) "\t"
    else """\s{2,}"""
  }

  /** `table_extractor.py:445-483`: table-type classification. Faithful
    * detail: the reference computes ratios over ALL cells including the
    * header row (its `rows` still contains row 0), which makes its own
    * demo revenue table "data" (8/20 currency = 0.4, not > 0.5). */
  def classifyTable(allCells: Seq[Cell], headers: Seq[String]): String = {
    val total = allCells.size
    if (total == 0) return "data"
    val counts = allCells.groupBy(_.dataType).view.mapValues(_.size).toMap
    def ratio(t: String) = counts.getOrElse(t, 0).toDouble / total
    if (ratio("currency") + ratio("number") > 0.5) "financial"
    else if (ratio("boolean") > 0.2) "compliance"
    else if (ratio("date") > 0.2) "schedule"
    else {
      val hl = headers.map(_.toLowerCase)
      if (Seq("amount", "revenue", "cost", "price", "total").exists(hl.contains)) "financial"
      else if (Seq("date", "deadline", "due", "schedule").exists(hl.contains)) "schedule"
      else if (Seq("status", "complete", "approved").exists(hl.contains)) "compliance"
      else "data"
    }
  }

  /** Parse one detected table region (`table_extractor.py:296-352`). */
  def parse(tableText: String, documentId: String, tableIndex: Int,
            charStart: Int = 0, charEnd: Int = 0,
            confidence: Double = 0.9): ExtractedTable = {
    val delimiter = detectDelimiter(tableText)
    val lines = tableText.trim.split("\n")
      .filterNot(l => borderLine.matcher(l).matches())

    val rows: Seq[Seq[Cell]] = lines.zipWithIndex.flatMap { case (line, rowIdx) =>
      val parts =
        if (delimiter == "|" || delimiter == "\t")
          line.split(Pattern.quote(delimiter)).map(_.trim).filter(_.nonEmpty)
        else line.trim.split(delimiter).map(_.trim).filter(_.nonEmpty)
      if (parts.isEmpty) None
      else Some(parts.toSeq.zipWithIndex.map { case (p, c) =>
        Cell(p, rowIdx, c, classifyCell(p))
      })
    }.toSeq

    val headers = rows.headOption.map(_.map(_.value)).getOrElse(Nil)
    val dataRows = rows.drop(1)
    val tableType = classifyTable(rows.flatten, headers)
    val title = {
      val m = titlePattern.matcher(tableText.take(200))
      if (m.find()) Some(m.group(1).trim) else None
    }

    // structured CSV (`:496-507`) — faithful quirk: the header line is
    // emitted AND rows still includes the header row, so it appears twice
    val structured = (
      (if (headers.nonEmpty) Seq(headers.map(h => s""""$h"""").mkString(",")) else Nil)
        ++ rows.map(_.map(c => s""""${c.value}"""").mkString(","))
      ).mkString("\n")

    val typeDesc = Map(
      "financial" -> "financial data table with monetary values",
      "compliance" -> "compliance or status tracking table",
      "schedule" -> "schedule or timeline table with dates",
      "data" -> "data table")
    val semanticParts = Seq.newBuilder[String]
    semanticParts += s"This is a ${typeDesc.getOrElse(tableType, "data table")}."
    if (headers.nonEmpty) semanticParts += s"Columns: ${headers.mkString(", ")}."
    semanticParts += s"Contains ${dataRows.length} data rows."
    if (dataRows.nonEmpty && headers.nonEmpty) {
      val sample = dataRows.head.take(4).zipWithIndex.collect {
        case (c, i) if i < headers.length => s"${headers(i)}: ${c.value}"
      }
      if (sample.nonEmpty) semanticParts += s"Sample row: ${sample.mkString(", ")}."
    }

    ExtractedTable(
      id = s"${documentId}_table_$tableIndex",
      document_id = documentId,
      rows = rows,
      numRows = rows.length,
      numCols = if (rows.nonEmpty) rows.map(_.length).max else 0,
      headers = headers,
      tableType = tableType,
      title = title,
      structuredText = structured,
      semanticDescription = semanticParts.result().mkString(" "),
      charStart = charStart, charEnd = charEnd, confidence = confidence)
  }

  /** Full extraction (`:590-629`): detect → confidence filter → parse. */
  def extractTables(text: String, documentId: String,
                    minConfidence: Double = 0.5): Seq[ExtractedTable] =
    detect(text).filter(_._4 >= minConfidence).zipWithIndex.map {
      case ((start, end, ttext, conf), i) =>
        parse(ttext, documentId, i, start, end, conf)
    }

  /** Persistence row for the `extracted_tables` table (reference
    * `metadata_store.py:423-481`, `init.sql:354-386`): the parsed
    * table as a NESTED struct — headers + typed cells survive the
    * round-trip as data, not as a JSON string. chunk_id points at the
    * `_structured` twin chunk (the retrieval handle); the `_semantic`
    * chunk id rides along as semantic_vector_id, mirroring the
    * reference's vector references. */
  case class StructuredData(
      headers: Seq[String],
      rows: Seq[Seq[Cell]],
      table_type: String,
      title: Option[String])

  case class TableRecord(
      id: String,
      document_id: String,
      chunk_id: String,
      organization_id: String,
      table_index: Int,
      markdown_content: String,
      structured_data: StructuredData,
      description: String,
      num_rows: Int,
      num_cols: Int,
      structured_vector_id: String,
      semantic_vector_id: String,
      char_start: Int,
      char_end: Int,
      confidence: Double)

  /** `extracted_tables` rows for a batch of parsed tables. */
  def tableRecords(spark: org.apache.spark.sql.SparkSession,
                   tables: Seq[ExtractedTable],
                   organizationId: String = "default"): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    tables.zipWithIndex.map { case (t, i) =>
      TableRecord(
        id = t.id, document_id = t.document_id,
        chunk_id = s"${t.id}_structured",
        organization_id = organizationId,
        table_index = i,
        markdown_content = t.structuredText,
        structured_data = StructuredData(t.headers, t.rows, t.tableType, t.title),
        description = t.semanticDescription,
        num_rows = t.numRows, num_cols = t.numCols,
        structured_vector_id = s"${t.id}_structured",
        semantic_vector_id = s"${t.id}_semantic",
        char_start = t.charStart, char_end = t.charEnd,
        confidence = t.confidence)
    }.toDF()
  }

  /** Dual chunks per table (`:631-673`): `_structured` for precise
    * queries, `_semantic` for conceptual queries. */
  def tableChunks(tables: Seq[ExtractedTable],
                  organizationId: String = "default"): Seq[UnifiedChunk] =
    tables.flatMap { t =>
      Seq(
        UnifiedChunk(
          id = s"${t.id}_structured", document_id = t.document_id,
          text = t.structuredText, chunk_index = 0, level = "table",
          element_type = Some("table_structured"),
          organization_id = organizationId,
          metadata = Map(
            "table_type" -> t.tableType,
            "headers" -> t.headers.mkString(","),
            "num_rows" -> t.numRows.toString,
            "title" -> t.title.getOrElse(""))),
        UnifiedChunk(
          id = s"${t.id}_semantic", document_id = t.document_id,
          text = t.semanticDescription, chunk_index = 1, level = "table",
          element_type = Some("table_semantic"),
          organization_id = organizationId,
          metadata = Map(
            "table_type" -> t.tableType,
            "headers" -> t.headers.mkString(","))))
    }
}
