package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily trade-panel aggregation — the Spark restatement of the reference's
  * `compute_trace_all_metrics` (A1–A3,
  * `stage0/create_daily_enhanced_trace.py:205-391`).
  *
  * The reference computes Prices / Volumes / BidAsk in three separate
  * groupbys and reassembles them with chained full-outer joins (J19). Here
  * everything is ONE `groupBy(id, date)` pass with conditional (FILTER)
  * aggregates — one shuffle, no outer-join reassembly, map-side partial
  * aggregation for free. first/last are `min_by`/`max_by` on a caller-
  * supplied unique intra-group order key (never Spark's order-sensitive
  * `first`/`last` — SURVEY.md §4 determinism trap).
  *
  * Input column contract (rename upstream): `id`, `date`, `price`, `qty`,
  * `dvol` (dollar volume), `ord` (unique orderable within (id,date)),
  * `side` ('B'/'S'), `contra` ('C' customer / 'D' dealer).
  *
  * Money sums go through decimal(28,4) so results are exact and bit-stable
  * across engines (the DuckDB-oracle hash gate); ratios are rounded to 6dp.
  */
object DailyMetrics {

  /** exact decimal sum rendered back as double */
  private def ds(e: String, p: Int = 4): String =
    s"cast(sum(cast(($e) as decimal(28,$p))) as double)"

  def panel(trades: DataFrame): DataFrame = {
    val aggs = Seq(
      s"round(${ds("price")} / count(1), 6) as prc_ew",
      s"round(${ds("price * dvol")} / nullif(${ds("dvol")}, 0.0), 6) as prc_vw",
      s"round(${ds("price * qty")} / nullif(${ds("qty")}, 0.0), 6) as prc_vw_par",
      "min_by(price, ord) as prc_first",
      "max_by(price, ord) as prc_last",
      "max(price) as prc_hi",
      "min(price) as prc_lo",
      "count(1) as trade_count",
      s"round(${ds("qty")} / 1e6, 6) as qvolume",
      s"round(${ds("dvol")} / 1e6, 6) as dvolume",
      // customer-facing bid side (dealer buys, B/C) — value-weighted
      s"round(${ds("price * dvol")} FILTER (WHERE side = 'B' AND contra = 'C')" +
        s" / nullif(${ds("dvol")} FILTER (WHERE side = 'B' AND contra = 'C'), 0.0), 6) as prc_bid",
      "max_by(price, ord) FILTER (WHERE side = 'B' AND contra = 'C') as bid_last",
      "count(1) FILTER (WHERE side = 'B' AND contra = 'C') as bid_count",
      // customer-facing ask side (dealer sells, S/C)
      s"round(${ds("price * dvol")} FILTER (WHERE side = 'S' AND contra = 'C')" +
        s" / nullif(${ds("dvol")} FILTER (WHERE side = 'S' AND contra = 'C'), 0.0), 6) as prc_ask",
      "count(1) FILTER (WHERE side = 'S' AND contra = 'C') as ask_count"
    )
    trades.groupBy(col("id"), col("date"))
      .agg(expr(aggs.head), aggs.tail.map(expr): _*)
  }
}
