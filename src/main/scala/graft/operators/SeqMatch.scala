package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAS-style ordered 1:1 sequence matching (reference J7/J8: pre-2012
  * reversal matching `stage0/create_daily_enhanced_trace.py:1912-2057`,
  * standard-regime `clean_reversal` `stage0/create_daily_standard_trace.py:138-267`).
  *
  * Both sides are numbered `row_number()` within the same key group under
  * explicit sort orders; a left row is "matched" (and removed) when a right
  * row exists with the same keys AND the same sequence number — i.e. the
  * n-th reversal cancels the n-th matching trade, duplicates matching 1:1
  * rather than m:n as a plain anti-join would.
  */
object SeqMatch {

  /** Rows of `left` that survive: those whose (keys, seq) has no counterpart
    * in `right`. One shuffle per side (same keys), then a broadcast-friendly
    * anti-join on keys+seq.
    */
  def antiBySequence(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOrder: Seq[Column],
      rightOrder: Seq[Column]): DataFrame = {
    val seq = "__seq"
    val l = withSeq(left, keys, leftOrder, seq)
    val r = withSeq(right, keys, rightOrder, seq).select((keys :+ seq).map(col): _*)
    l.join(r, keys :+ seq, "left_anti").drop(seq)
  }

  /** Append a per-key 1-based sequence number (the reference's `add_seq`,
    * `stage0/create_daily_standard_trace.py:109-118`).
    */
  def withSeq(df: DataFrame, keys: Seq[String], order: Seq[Column], as: String): DataFrame =
    df.withColumn(as, row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
}
