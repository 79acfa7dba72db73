package graft

import org.apache.spark.sql.functions._

/** S4 — parquet(snappy) and CSV-gzip sinks with scan round-trip
  * (stage0/create_daily_enhanced_trace.py:2838-2860).
  */
class SinksSpec extends SparkSpec {

  test("csv-gzip and parquet sinks round-trip the daily panel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sinks").toString
    val panel = graft.queries.QTracePipeline
      .dailyPanel(spark, "/root/testdata/sf0.001")
      .limit(200).cache()
    val n = panel.count()
    assert(n > 0)

    panel.write.mode("overwrite")
      .option("compression", "snappy").parquet(s"$dir/panel_parquet")
    panel.write.mode("overwrite")
      .option("compression", "gzip").option("header", "true")
      .csv(s"$dir/panel_csv")

    val backP = spark.read.parquet(s"$dir/panel_parquet")
    assert(backP.count() == n)
    assert(backP.columns.toSet == panel.columns.toSet)
    val gzFiles = new java.io.File(s"$dir/panel_csv").listFiles()
      .filter(_.getName.endsWith(".csv.gz"))
    assert(gzFiles.nonEmpty)
    val backC = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/panel_csv")
    assert(backC.count() == n)
  }
}
