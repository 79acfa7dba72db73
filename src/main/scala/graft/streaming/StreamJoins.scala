package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream joins (SURVEY.md §2.10 stretch × the join
  * family): Spark only bounds both sides' buffers when the join carries
  * an equality AND an event-time-range condition — each side's state
  * evicts once the OTHER side's watermark passes the range. Callers
  * must watermark both inputs.
  */
object StreamJoins {

  /** inner join: right rows within `(leftTs - horizon, leftTs]` of each
    * matching left row — the "recent related events" shape
    * (trades×corrections, purchases×errors).
    */
  def recentInner(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      horizon: String): DataFrame =
    left.join(right,
      leftKey === rightKey &&
        rightTs >= leftTs - expr(s"INTERVAL $horizon") &&
        rightTs <= leftTs)
}
