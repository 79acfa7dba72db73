package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running totals as a [[StatefulProcessor]] — the Spark 4
  * transformWithState API (state API v2), the successor to
  * mapGroupsWithState this engine's sessionizer uses: typed named state
  * (`ValueState`), explicit TTL config, timer support, and the
  * RocksDB-backed state store it requires. One micro-batch's rows for a
  * key fold locally; the persisted (n, cents) pair advances; one
  * snapshot row per (key, batch-with-presence) emits — so the output IS
  * the running-total history at batch granularity, which a batch window
  * (cumulative sum over the batch index) reproduces exactly: the
  * `stream_transform_state` oracle.
  *
  * State is one 16-byte pair per live key — the bounded-state shape; a
  * production ingest would add `TTLConfig` eviction where keys retire.
  */
case class TwsEvent(user_id: Long, cents: Long)
case class TwsTotals(user_id: Long, n_events: Long, sum_cents: Long)

class RunningTotals extends StatefulProcessor[Long, TwsEvent, TwsTotals] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsTotals] = {
    var n = 0L
    var c = 0L
    rows.foreach { r => n += 1L; c += r.cents }
    val (pn, pc) =
      if (totals.exists()) totals.get() else (0L, 0L)
    totals.update((pn + n, pc + c))
    Iterator.single(TwsTotals(key, pn + n, pc + c))
  }
}

object RunningTotals {
  /** transformWithState requires the RocksDB state store provider —
    * pin it (and restore the previous provider) around a query run. */
  def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
