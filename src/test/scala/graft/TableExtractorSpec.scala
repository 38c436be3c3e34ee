package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.TableExtractor

/** Pins I6 on the reference's own demo table (FIXTURES B4,
  * `table_extractor.py:677-703`): markdown revenue table → financial
  * type, dual chunks, currency/percentage cells. */
class TableExtractorSpec extends AnyFunSuite {

  val sampleText =
    """Financial Summary for Q4 2023
      |
      |Table 1: Revenue by Segment
      |
      || Segment          | Q4 2023    | Q4 2022    | Change   |
      ||------------------|------------|------------|----------|
      || Software         | $2,500,000 | $2,100,000 | 19%      |
      || Services         | $1,800,000 | $1,650,000 | 9%       |
      || Hardware         | $800,000   | $950,000   | -16%     |
      || Total            | $5,100,000 | $4,700,000 | 8.5%     |
      |
      |The results show strong growth in software segment.""".stripMargin

  test("detects and parses the B4 revenue table (faithful type: data)") {
    val tables = TableExtractor.extractTables(sampleText, "doc_001")
    assert(tables.length == 1)
    val t = tables.head
    assert(t.id == "doc_001_table_0")
    // faithful reference behavior: ratios are computed over ALL cells
    // including the header row, so 8/20 currency = 0.4 (not > 0.5) and
    // the reference's own demo table classifies as "data"
    assert(t.tableType == "data")
    assert(t.headers == Seq("Segment", "Q4 2023", "Q4 2022", "Change"))
    assert(t.numCols == 4)
    // header + 4 data rows (border line dropped)
    assert(t.numRows == 5)
    assert(t.title.isEmpty || t.title.get.startsWith("Table 1"))
  }

  test("cell typing: currency, percentage, text (reference regexes)") {
    assert(TableExtractor.classifyCell("$2,500,000") == "currency")
    assert(TableExtractor.classifyCell("19%") == "percentage")
    assert(TableExtractor.classifyCell("8.5%") == "percentage")
    // faithful quirk: negative percentages don't match the reference's
    // percentage regex and fall through to text
    assert(TableExtractor.classifyCell("-16%") == "text")
    assert(TableExtractor.classifyCell("1,234.5") == "number")
    assert(TableExtractor.classifyCell("12/31/2023") == "date")
    assert(TableExtractor.classifyCell("yes") == "boolean")
    assert(TableExtractor.classifyCell("Software") == "text")
  }

  test("dual chunks: _structured CSV + _semantic description (B4)") {
    val tables = TableExtractor.extractTables(sampleText, "doc_001")
    val chunks = TableExtractor.tableChunks(tables, "org_x")
    assert(chunks.length == 2)
    val structured = chunks.find(_.id.endsWith("_structured")).get
    val semantic = chunks.find(_.id.endsWith("_semantic")).get
    assert(structured.text.contains(""""Segment","Q4 2023""""))
    assert(structured.text.contains(""""$2,500,000""""))
    assert(semantic.text.startsWith("This is a data table"))
    assert(semantic.text.contains("Columns: Segment, Q4 2023, Q4 2022, Change."))
    assert(semantic.text.contains("Contains 4 data rows."))
    assert(structured.metadata("table_type") == "data")
    assert(structured.organization_id == "org_x")
  }

  test("financial, compliance and schedule classification rules") {
    // >50% currency+number over ALL cells => financial
    val fin = "| A | B |\n| $5 | 10 |\n| $6 | 20 |\n| $7 | 30 |"
    assert(TableExtractor.parse(fin, "d", 2).tableType == "financial")
    val compliance =
      "Item\tStatus\tApproved\nA\tyes\tno\nB\tno\tyes\nC\tyes\tyes"
    val t1 = TableExtractor.parse(compliance, "d", 0)
    assert(t1.tableType == "compliance")
    // needs tabs > line count to select the tab delimiter (reference
    // delimiter inference), hence 3 columns
    val schedule =
      "Phase\tDue\tOwner\nDesign\t01/15/2024\tAna\nBuild\t03/01/2024\tBo\nShip\t06/30/2024\tCy"
    val t2 = TableExtractor.parse(schedule, "d", 1)
    assert(t2.tableType == "schedule")
  }

  test("no false positives on plain prose") {
    val prose = "This is a normal paragraph.\nIt has no tables at all.\nJust sentences."
    assert(TableExtractor.extractTables(prose, "d").isEmpty)
  }

  test("extracted_tables persistence: nested structured_data round-trips") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val tables = TableExtractor.extractTables(sampleText, "doc9")
    assert(tables.nonEmpty)
    val recs = TableExtractor.tableRecords(spark, tables, "org_acme")
    val root = java.nio.file.Files.createTempDirectory("xtab").toString
    graft.sources.TableStore.saveExtractedTables(recs, root)
    val back = graft.sources.TableStore.loadExtractedTables(spark, root)
    assert(back.count() == tables.length)
    val row = back.filter(col("id") === tables.head.id).head()
    // nested struct survives: headers, typed cells, classification
    val sd = row.getAs[org.apache.spark.sql.Row]("structured_data")
    assert(sd.getSeq[String](sd.fieldIndex("headers")) == tables.head.headers)
    assert(sd.getString(sd.fieldIndex("table_type")) == tables.head.tableType)
    val firstRow = sd.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](
      sd.fieldIndex("rows")).head
    assert(firstRow.nonEmpty) // cells present with value/row/col/dataType
    assert(firstRow.head.schema.fieldNames.toSeq ==
      Seq("value", "row", "col", "dataType"))
    // tenant partition column present + chunk linkage
    assert(row.getAs[String]("organization_id") == "org_acme")
    assert(row.getAs[String]("chunk_id") == s"${tables.head.id}_structured")
  }
}
