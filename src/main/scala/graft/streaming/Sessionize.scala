package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization of the events stream
  * via `flatMapGroupsWithState` — the KeyValueGroupedDataset stateful-
  * operator surface (SURVEY.md §2.10 stretch; the reference has no
  * streaming, its closest analogue is bounded-memory incremental chunking).
  *
  * A session closes when no event arrives within `gapSeconds` of the last
  * one — detected on the next event, or by EVENT-TIME timeout once the
  * watermark passes last+gap (tail sessions). Event-time timeouts are
  * data-driven: no busy micro-batch loop (a ProcessingTimeTimeout design
  * makes the engine re-trigger continuously). Callers must set a
  * watermark on `ts` upstream. State per user is one small struct —
  * bounded, evicted on close.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(
      startMs: Long, lastMs: Long, n: Int, valueSum: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, value_sum: Double)

  def sessions(
      events: Dataset[Ev],
      gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.startMs),
              new Timestamp(s.lastMs), s.n, s.valueSum))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // out-of-order events may extend the session backwards too
                  cur = Some(s.copy(startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    n = s.n + 1, valueSum = s.valueSum + e.value))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.startMs),
                    new Timestamp(s.lastMs), s.n, s.valueSum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // setTimeoutTimestamp throws if the instant is not strictly
              // ahead of the watermark (late event resuming a session whose
              // natural deadline already passed) — clamp forward one ms.
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1L))
            }
            closed.result().iterator
          }
      }
  }
}
