package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S7 — CSV-over-URL scan (the reference's FRED key-rate fetch,
  * `stage1/helper_functions.py:257-307`): one tiny CSV per series, outer-
  * merged on the date column, forward-filled, percent→decimal.
  *
  * The bytes are fetched on the driver (see [[UrlBytes]] for why that is
  * the right scale call for dimension feeds) and parsed by Spark's CSV
  * reader via `Dataset[String]`, so schema inference, quoting and nulls
  * behave exactly like `spark.read.csv` on a landed file.
  */
object CsvUrl {

  /** read one CSV (header row) from a URL or path into a DataFrame.
    *
    * The fetched bytes are staged to a temp file and read with
    * `multiLine=true`, so RFC-4180 quoting — embedded newlines and blank
    * lines inside quoted fields — behaves exactly like `spark.read.csv` on
    * a landed file (a line-split + re-parse corrupts such records). The
    * temp file is driver-local: correct for local/single-JVM runs; on a
    * multi-node cluster land the bytes on shared storage first (which is
    * what the reference does with its download directory).
    */
  def read(spark: SparkSession, urlOrPath: String): DataFrame = {
    val bytes = UrlBytes.fetch(urlOrPath)
    val tmp = java.nio.file.Files.createTempFile("graft_csv_", ".csv")
    tmp.toFile.deleteOnExit()
    java.nio.file.Files.write(tmp, bytes)
    spark.read.option("header", "true").option("inferSchema", "false")
      .option("multiLine", "true")
      .csv(tmp.toUri.toString)
  }

  /** FRED-style multi-series merge: each (seriesName → url) CSV has columns
    * (dateCol, seriesId); outer-join all on the date, sort, forward-fill,
    * divide by 100. The result is one row per date — a broadcastable
    * curve dimension. The single-partition ffill window is deliberate:
    * the frame is dimension-sized by construction.
    */
  def yieldPanel(
      spark: SparkSession,
      series: Seq[(String, String, String)], // (seriesId, outCol, url)
      dateCol: String): DataFrame = {
    val frames = series.map { case (sid, out, url) =>
      read(spark, url).select(
        to_date(col(dateCol)).as("dt"),
        col(sid).cast("double").as(out))
    }
    val merged = frames.reduce((a, b) => a.join(b, Seq("dt"), "outer"))
    // global window is safe here by construction: the frame is one row
    // per CALENDAR DATE of a rate series (thousands of rows at most,
    // bounded by time itself, not by data volume) — never use this
    // shape on a fact table (see operators.PrefixSum)
    val w = Window.orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    series.foldLeft(merged) { case (d, (_, out, _)) =>
      d.withColumn(out, last(col(out), ignoreNulls = true).over(w) / 100.0)
    }.orderBy(col("dt"))
  }
}
