package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable

/** S6 — Excel (.xlsx) scan (the reference's Liu–Wu yields workbook fetch,
  * `stage1/helper_functions.py:645-762`, `pd.read_excel(..., header=8)`).
  *
  * XLSX is a ZIP of XML parts; this reader uses only the JDK (zip + DOM)
  * — no POI — and supports the cell types the wild produces: shared
  * strings (`t="s"`), inline strings (`t="inlineStr"`), formula strings
  * (`t="str"`), and numeric (no `t`). Sparse rows resolve the column from
  * each cell's `r="BC12"` reference. All values surface as strings in a
  * `headerRow`-named schema; callers cast — the same contract as
  * `spark.read.csv` without inference.
  *
  * Scale: workbooks are driver-sized by format (a sheet caps at ~1M rows);
  * the parsed result is a dimension frame (`createDataFrame` on driver
  * rows), joined broadcast-side against facts.
  */
object Xlsx {

  private def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def zipParts(bytes: Array[Byte], wanted: Set[String]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (wanted(e.getName)) out(e.getName) = UrlBytes.readAll(
        new java.io.FilterInputStream(zin) { override def close(): Unit = () })
      e = zin.getNextEntry
    }
    zin.close()
    out.toMap
  }

  private def parse(xml: Array[Byte]) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // workbooks can arrive from remote URLs (UrlBytes): forbid DOCTYPE
    // outright so a malicious part can neither exfiltrate local files via
    // external entities (XXE) nor blow up via entity expansion
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(xml))
  }

  /** raw sheet1 grid: rows of (colIndex → string value) */
  private def grid(bytes: Array[Byte]): Seq[Map[Int, String]] = {
    val parts = zipParts(bytes,
      Set("xl/worksheets/sheet1.xml", "xl/sharedStrings.xml"))
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(b) =>
        val doc = parse(b)
        val sis = doc.getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
    }
    val doc = parse(parts.getOrElse("xl/worksheets/sheet1.xml",
      throw new java.io.FileNotFoundException("xl/worksheets/sheet1.xml")))
    val rows = doc.getElementsByTagName("row")
    (0 until rows.getLength).map { r =>
      val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("c")
      // the r="BC12" cell reference is OPTIONAL in OOXML: streaming
      // writers omit it, and an unreferenced cell occupies the column
      // right after the previous cell (column 0 at row start)
      var cur = -1
      (0 until cells.getLength).flatMap { c =>
        val cell = cells.item(c).asInstanceOf[org.w3c.dom.Element]
        val ref = cell.getAttribute("r")
        val idx = if (ref.isEmpty) cur + 1 else colIndex(ref)
        cur = idx
        val t = cell.getAttribute("t")
        val vNodes = cell.getElementsByTagName(if (t == "inlineStr") "t" else "v")
        if (vNodes.getLength == 0) None
        else {
          val raw = vNodes.item(0).getTextContent
          val v = if (t == "s") shared(raw.toInt) else raw
          Some(idx -> v)
        }
      }.toMap
    }
  }

  /** read sheet1 with column names taken from `headerRow` (0-based; the
    * reference uses header=8); rows above it are skipped, like pandas.
    */
  def read(spark: SparkSession, urlOrPath: String, headerRow: Int = 0): DataFrame = {
    val g = grid(UrlBytes.fetch(urlOrPath))
    require(headerRow < g.length, s"headerRow $headerRow beyond sheet (${g.length} rows)")
    val header = g(headerRow)
    val width = (header.keys ++ g.drop(headerRow + 1).flatMap(_.keys)).maxOption
      .getOrElse(-1) + 1
    val names = (0 until width).map(i =>
      header.getOrElse(i, s"_c$i").trim match { case "" => s"_c$i"; case s => s })
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val rows = g.drop(headerRow + 1).map(m =>
      Row.fromSeq((0 until width).map(m.get(_).orNull)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  // ---- minimal writer (tests + demo queries; inline strings) ----------

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** write a one-sheet workbook: numbers as numeric cells, everything else
    * as inline strings — enough structure for any standards-conforming
    * xlsx reader (including [[read]]).
    */
  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val sheet = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (r, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        r.zipWithIndex.foreach { case (v, ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          v match {
            case null => ()
            case n: Int => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Long => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Double => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case s =>
              sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s.toString)}</t></is></c>""")
          }
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rels,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> workbookRels,
      "xl/worksheets/sheet1.xml" -> sheet
    ).foreach { case (name, content) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
  }
}
