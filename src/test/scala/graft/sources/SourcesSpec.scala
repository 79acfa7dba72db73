package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Out-of-band sources (S6 xlsx / S7 csv-over-url / S8 parquet-in-zip).
  * URL paths are exercised via file:// — identical code path to http(s)
  * minus the protocol handler (no egress in this sandbox).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/$name"

  test("xlsx round-trip: preamble skip, sparse rows, numeric + string cells") {
    val path = tmp("graft_test_sheet.xlsx")
    Xlsx.write(path, Seq(
      Seq("junk preamble"),
      Seq("k", "name", "score"),
      Seq(1L, "alpha", 2.5),
      Seq(2L, null, 4.0),        // sparse row: missing middle cell
      Seq(3L, "gamma & <co>", 9.0))) // xml-escaped content
    val df = Xlsx.read(spark, path, headerRow = 1)
    assert(df.columns.toSeq == Seq("k", "name", "score"))
    val rows = df.orderBy(col("k")).collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "alpha" && rows(0).getString(2) == "2.5")
    assert(rows(1).getString(1) == null)
    assert(rows(2).getString(1) == "gamma & <co>")
  }

  test("xlsx shared-strings cells (t=\"s\") resolve through sharedStrings.xml") {
    // hand-built workbook exercising the sharedStrings path the writer
    // doesn't emit (it uses inline strings) — real-world xlsx mostly uses
    // shared strings, so the reader must resolve indices
    val path = tmp("graft_test_shared.xlsx")
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val shared =
      """<?xml version="1.0"?><sst count="3" uniqueCount="3">
        |<si><t>name</t></si><si><t>score</t></si><si><t>alice</t></si></sst>""".stripMargin
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    Seq("xl/worksheets/sheet1.xml" -> sheet,
        "xl/sharedStrings.xml" -> shared).foreach { case (n, c) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(c.getBytes("UTF-8")); zout.closeEntry()
    }
    zout.close()
    val df = Xlsx.read(spark, path, headerRow = 0)
    assert(df.columns.toSeq == Seq("name", "score"))
    val r = df.collect().head
    assert(r.getString(0) == "alice" && r.getString(1) == "42")
  }

  test("xlsx adversarial layout: missing r= refs, mixed inline/shared cells") {
    // the r="A1" cell reference is optional — streaming writers omit it
    // and the cell then occupies the column after the previous one; a
    // mid-row explicit ref must also re-anchor the cursor for following
    // unreferenced cells
    val path = tmp("graft_test_nrefs.xlsx")
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row><c t="s"><v>0</v></c><c t="s"><v>1</v></c><c t="s"><v>2</v></c></row>
        |<row><c><v>1</v></c><c t="inlineStr"><is><t>one</t></is></c><c><v>1.5</v></c></row>
        |<row><c r="A3"><v>2</v></c><c r="C3"><v>2.5</v></c><c><v>99</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val shared =
      """<?xml version="1.0"?><sst count="3" uniqueCount="3">
        |<si><t>k</t></si><si><t>label</t></si><si><t>x</t></si></sst>""".stripMargin
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    Seq("xl/worksheets/sheet1.xml" -> sheet,
        "xl/sharedStrings.xml" -> shared).foreach { case (n, c) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(c.getBytes("UTF-8")); zout.closeEntry()
    }
    zout.close()
    val df = Xlsx.read(spark, path, headerRow = 0)
    assert(df.columns.toSeq == Seq("k", "label", "x", "_c3"))
    val rows = df.orderBy(col("k")).collect()
    // row 2: all three cells unreferenced -> columns 0,1,2
    assert(rows(0).getString(0) == "1" && rows(0).getString(1) == "one" &&
      rows(0).getString(2) == "1.5")
    // row 3: explicit C3 skips B; the trailing unreferenced cell lands in D
    assert(rows(1).getString(0) == "2" && rows(1).getString(1) == null &&
      rows(1).getString(2) == "2.5" && rows(1).getString(3) == "99")
  }

  test("parquet-in-zip: member located by name; missing member raises") {
    import spark.implicits._
    val pq = tmp("graft_test_member_dir")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(pq)
    val part = new java.io.File(pq).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val zipPath = tmp("graft_test_member.zip")
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zout.putNextEntry(new java.util.zip.ZipEntry("nested/t.parquet"))
    zout.write(java.nio.file.Files.readAllBytes(part.toPath))
    zout.closeEntry(); zout.close()
    assert(ParquetInZip.members(zipPath) == Seq("nested/t.parquet"))
    val back = ParquetInZip.read(spark, zipPath, "nested/t.parquet")
    assert(back.orderBy(col("id")).collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
    intercept[java.io.FileNotFoundException] {
      ParquetInZip.read(spark, zipPath, "absent.parquet")
    }
  }

  test("csv-over-url yield panel: outer merge, ffill, percent to decimal") {
    val a = tmp("graft_test_dgs1.csv")
    val b = tmp("graft_test_dgs2.csv")
    java.nio.file.Files.write(java.nio.file.Paths.get(a),
      "DATE,DGS1\n2020-01-01,1.0\n2020-01-03,2.0\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(b),
      "DATE,DGS2\n2020-01-01,3.0\n2020-01-02,4.0\n".getBytes)
    val panel = CsvUrl.yieldPanel(spark,
      Seq(("DGS1", "oneyr", s"file://$a"), ("DGS2", "twoyr", s"file://$b")),
      dateCol = "DATE")
    val rows = panel.collect().map(r =>
      (r.getDate(0).toString, r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("2020-01-01", 0.01, 0.03),
      ("2020-01-02", 0.01, 0.04),  // oneyr forward-filled
      ("2020-01-03", 0.02, 0.04))) // twoyr forward-filled
  }

  test("jsonl: torn lines quarantined in _corrupt_record, healthy rows parse") {
    import org.apache.spark.sql.types._
    val p = tmp("graft_test_docs.jsonl")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      ("""{"doc_id": 1, "text": "hello \"quoted\" world", "lang": "en"}""" + "\n" +
        """{"doc_id": 2, "text": "tr""" + "\n" + // torn mid-record
        """{"doc_id": 3, "text": "multi\nline body", "lang": "de"}""" + "\n")
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val all = Jsonl.read(spark, s"file://$p", schema)
    // the audit projection must reference >= 1 data column: Spark
    // disallows querying ONLY the corrupt column off a raw JSON scan
    val corrupt = all.filter(col(Jsonl.CorruptCol).isNotNull)
      .select(col("doc_id"), col(Jsonl.CorruptCol))
      .collect().map(_.getString(1))
    assert(corrupt.toSeq == Seq("""{"doc_id": 2, "text": "tr"""),
      s"expected the torn line quarantined, got ${corrupt.toSeq}")
    val clean = Jsonl.readClean(spark, s"file://$p", schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(clean.toSet == Set(
      (1L, "hello \"quoted\" world", "en"),
      (3L, "multi\nline body", "de")))
    // count() prunes every data column — the raw json datasource then
    // dies with QUERY_ONLY_CORRUPT_RECORD_COLUMN (only the corrupt
    // column remains referenced); the text+from_json formulation must
    // keep plain counts working (the s12 bench path does exactly this)
    assert(Jsonl.readClean(spark, s"file://$p", schema).count() == 2L)
    // corrupt-only audits are equally legal here
    assert(Jsonl.read(spark, s"file://$p", schema)
      .filter(col(Jsonl.CorruptCol).isNotNull).count() == 1L)
  }

  test("jsonl: a literal 'null' line is quarantined, not a phantom all-null row") {
    import org.apache.spark.sql.types._
    // buggy serializers emit bare `null` lines (valid JSON, no object);
    // from_json must route them to the corrupt column like the raw json
    // datasource did — NOT null-expand them into healthy all-null docs.
    // Pinned empirically: Spark's JacksonParser treats a root-level JSON
    // null as a malformed record (this is version-sensitive behavior,
    // hence the regression test).
    val p = tmp("graft_test_nullline.jsonl")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      ("""{"doc_id": 1, "text": "ok"}""" + "\nnull\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val clean = Jsonl.readClean(spark, s"file://$p", schema)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(clean.toSeq == Seq((1L, "ok")),
      s"null line leaked into clean rows: ${clean.toSeq}")
    val corrupt = Jsonl.read(spark, s"file://$p", schema)
      .filter(col(Jsonl.CorruptCol).isNotNull)
      .select(col(Jsonl.CorruptCol)).collect().map(_.getString(0))
    assert(corrupt.toSeq == Seq("null"),
      s"expected the null line quarantined, got ${corrupt.toSeq}")
  }

  test("jsonl: whitespace-only lines (tabs included) are skipped, not phantom rows") {
    import org.apache.spark.sql.types._
    // the blank-line skip must be whitespace-aware: a tabs-only line
    // passes an ascii-space trim(), parses to a NULL struct, and would
    // surface as an all-null "healthy" row — same failure mode as the
    // bare-`null` line, reached via whitespace
    val p = tmp("graft_test_wsline.jsonl")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      ("""{"doc_id": 1, "text": "ok"}""" + "\n\t\t\n   \n\t \r\n" +
        """{"doc_id": 2, "text": "ok2"}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val clean = Jsonl.readClean(spark, s"file://$p", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(clean.toSeq == Seq((1L, "ok"), (2L, "ok2")),
      s"whitespace line leaked into clean rows: ${clean.toSeq}")
    assert(Jsonl.read(spark, s"file://$p", schema).count() == 2L,
      "whitespace-only lines must be skipped before parsing, not quarantined")
  }
}
