package graft.streaming

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Streaming/batch parity: the AvailableNow streaming run over the events
  * files must produce exactly the batch aggregation's result.
  */
class StreamingDailySpec extends SparkSpec {

  test("streaming daily panel equals batch daily panel (AvailableNow)") {
    val dir = "/root/testdata/sf0.001"
    // the file streaming source requires a directory of files
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamed = StreamingDaily
      .runAvailableNow(spark, streamDir.toString, "stream_daily_spec")
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted

    val batch = StreamingDaily.dailyPanel(
        Tables.events(spark, dir).withWatermark("ts", "2 days"))
    // batch plan: strip the watermark requirement by recomputing directly
    val batchRows = Tables.events(spark, dir)
      .groupBy(col("user_id").as("id"), window(col("ts"), "1 day").as("win"))
      .agg(
        expr("cast(sum(cast(value as decimal(18,2))) as double) as value_sum"),
        count(lit(1)).as("trade_count"),
        expr("min_by(value, event_id) as first_value"),
        expr("max_by(value, event_id) as last_value"),
        max(col("value")).as("hi"),
        min(col("value")).as("lo"))
      .select(col("id"), col("win.start").cast("date").as("dt"),
        col("value_sum"), col("trade_count"), col("first_value"),
        col("last_value"), col("hi"), col("lo"))
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batchRows.toSeq)
  }
}
