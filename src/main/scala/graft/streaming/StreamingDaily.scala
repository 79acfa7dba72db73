package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming restatement of the daily aggregation (SURVEY.md
  * §2.10): the reference is a scheduled batch pipeline; its daily panel
  * (A1–A3) re-expresses naturally as a watermarked tumbling-window
  * aggregation over the `events` stream.
  *
  * Scale notes: state is keyed by (user, day window); in the production
  * `append`-mode sink ([[appendWriter]]) the 2-day watermark finalizes and
  * EVICTS each window's state, so state stays bounded. (`complete` mode —
  * used only by the in-memory test sink below — retains all windows by
  * definition; never use it on a long-running stream.) The aggregation is
  * the same single-pass conditional-aggregate shape as the batch
  * `DailyMetrics.panel`, so the streaming and batch plans share map-side
  * partial aggregation and one shuffle per micro-batch.
  */
object StreamingDaily {

  /** file-source stream over an events parquet directory (schema taken
    * from a static read — required by streaming sources).
    */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // the file stream source monitors a DIRECTORY; when pointed at a
    // single parquet file, stage it via symlink (shared, collision-free
    // staging in [[StreamStaging]])
    graft.Tables.normalizeEventsTs(
      spark.readStream
        .schema(schema)
        .parquet(StreamStaging.dirFor(path)))
  }

  /** watermarked 1-day tumbling-window daily panel per user. */
  def dailyPanel(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 days")
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

  /** Production path: append-mode writer — rows emit once their window is
    * finalized by the watermark, which is also when the state is evicted
    * (the bounded-state guarantee above). Caller picks format/location.
    */
  def appendWriter(panel: DataFrame): DataStreamWriter[Row] =
    panel.writeStream.outputMode("append")

  /** TEST-ONLY: run to completion over the files currently in `path`
    * (AvailableNow) into an in-memory table; returns the collected result.
    * Uses `complete` mode so a single AvailableNow batch emits every
    * window without waiting on watermark advancement — acceptable only
    * because the memory sink and the stream are both bounded here.
    */
  def runAvailableNow(
      spark: SparkSession,
      path: String,
      queryName: String): Array[Row] = {
    val q = dailyPanel(eventsStream(spark, path))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).collect()
  }
}
