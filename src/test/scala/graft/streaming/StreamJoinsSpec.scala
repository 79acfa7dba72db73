package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream join over MemoryStreams: matches land across
  * micro-batches (both sides buffer), and rows arriving behind the
  * watermark-evicted range are dropped — the bounded-state contract.
  */
class StreamJoinsSpec extends SparkSpec {

  case class Buy(uid: Long, ts_buy: Timestamp, eid_buy: Long)
  case class Err(uid2: Long, ts_err: Timestamp, eid_err: Long)
  private def ts(h: Long) = new Timestamp(1700000000000L + h * 3600 * 1000)

  test("cross-batch match within horizon; late row beyond watermark dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val buys = MemoryStream[Buy]
    val errs = MemoryStream[Err]
    val joined = StreamJoins.recentInner(
      buys.toDF().withWatermark("ts_buy", "0 seconds"),
      errs.toDF().withWatermark("ts_err", "0 seconds"),
      col("uid"), col("uid2"), col("ts_buy"), col("ts_err"),
      horizon = "6 HOURS")
    val q = joined.select(col("eid_buy"), col("eid_err"))
      .writeStream.format("memory").queryName("ssj_spec")
      .outputMode("append").start()

    // batch 1: a buy, no errors yet — nothing emitted, buy buffered
    buys.addData(Buy(1, ts(10), 100))
    q.processAllAvailable()
    assert(spark.table("ssj_spec").count() == 0)

    // batch 2: an error 2h BEFORE the buffered buy arrives later —
    // cross-batch match emits
    errs.addData(Err(1, ts(8), 200))
    q.processAllAvailable()
    val rows = spark.table("ssj_spec").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((100L, 200L)))

    // batch 3: both sides advance ~10 days → watermarks pass the first
    // buy's range and its state evicts
    buys.addData(Buy(2, ts(250), 300))
    errs.addData(Err(2, ts(249), 400))
    q.processAllAvailable()
    assert(spark.table("ssj_spec").count() == 2)

    // batch 4: an error inside the FIRST buy's horizon arrives far behind
    // the watermark — dropped, no new match
    errs.addData(Err(1, ts(9), 500))
    q.processAllAvailable()
    assert(spark.table("ssj_spec").count() == 2,
      "late row behind the watermark must not revive evicted join state")
    q.stop()
  }
}
