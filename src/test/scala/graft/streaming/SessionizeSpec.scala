package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Stateful sessionization over a MemoryStream: sessions split on the gap,
  * state survives across micro-batches.
  */
class SessionizeSpec extends SparkSpec {

  test("gap-based sessions close on the next event across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Sessionize.Ev]
    val withWm = input.toDS()
      .withWatermark("ts", "0 seconds")
    val q = Sessionize.sessions(withWm.as[Sessionize.Ev], gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions_spec")
      .outputMode("append").start()

    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    // batch 1: two events 10s apart (one open session)
    input.addData(Sessionize.Ev(1, ts(0), 1.0), Sessionize.Ev(1, ts(10), 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_spec").count() == 0) // still open

    // batch 2: event 300s later → closes session 1 on arrival
    input.addData(Sessionize.Ev(1, ts(310), 5.0))
    q.processAllAvailable()
    val rows = spark.table("sessions_spec").as[Sessionize.Session].collect()
    assert(rows.length == 1)
    assert(rows.head.n_events == 2)
    assert(rows.head.value_sum == 3.0)
    assert(rows.head.session_start == ts(0) && rows.head.session_end == ts(10))

    // batch 3: another user far in the future advances the watermark past
    // last+gap → user 1's tail session closes by EVENT-TIME timeout
    input.addData(Sessionize.Ev(2, ts(1000), 1.0))
    q.processAllAvailable()
    input.addData(Sessionize.Ev(2, ts(1001), 1.0)) // batch to fire timeouts
    q.processAllAvailable()
    val rows2 = spark.table("sessions_spec").as[Sessionize.Session].collect()
    assert(rows2.exists(r => r.user_id == 1 && r.session_start == ts(310)
      && r.n_events == 1 && r.value_sum == 5.0),
      s"tail session not closed: ${rows2.mkString(";")}")
    q.stop()
  }
}
