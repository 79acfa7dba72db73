package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import graft.streaming.StreamingDaily
import org.apache.spark.sql.functions._

/** Structured Streaming surface, driver-gated (SURVEY.md §2.10 stretch):
  * the watermarked tumbling-window daily panel run to completion over the
  * events files with Trigger.AvailableNow, then hash-compared against the
  * equivalent BATCH aggregation in DuckDB — the streaming/batch
  * equivalence that StreamingDailySpec asserts in-process, promoted to an
  * oracle row.
  */
object QStreaming extends Registry {

  private val runSeq = new AtomicInteger(0)

  def qs: Seq[Q] = Seq(

    Q("stream_daily_panel",
      (s, d) => {
        val name = s"graft_stream_daily_${runSeq.incrementAndGet()}"
        StreamingDaily.runAvailableNow(s, s"$d/events.parquet", name)
        s.table(name).select(col("id"), col("dt"), col("value_sum"),
          col("trade_count"), col("first_value"), col("last_value"),
          col("hi"), col("lo"))
      },
      Some("""SELECT user_id AS id, CAST(ts AS DATE) AS dt,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
                     count(*) AS trade_count,
                     arg_min(value, event_id) AS first_value,
                     arg_max(value, event_id) AS last_value,
                     max(value) AS hi, min(value) AS lo
              FROM events GROUP BY 1, 2"""))
  )
}
