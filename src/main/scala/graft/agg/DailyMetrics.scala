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
  * Input column contract (rename upstream): `id`, `dt`, `price`, `qty`,
  * `dvol` (dollar volume), `ord` (unique orderable within (id,dt)),
  * `secs` (seconds after midnight, int), `side` ('B'/'S'),
  * `contra` ('C' customer / 'D' dealer).
  *
  * Determinism contract: `price`, `qty`, `dvol` must arrive as DECIMAL
  * columns (exact values). All sums/products then stay in decimal — exact
  * and order-independent — and only the final ratio is computed in double,
  * so results are bit-stable across engines (the DuckDB-oracle hash gate).
  */
object DailyMetrics {

  private val bid = "side = 'B' AND contra = 'C'"
  private val ask = "side = 'S' AND contra = 'C'"

  /** @param sumScale decimal scale of the exact sums — must cover the true
    * decimal scale of price*dvol (e.g. 6 for 2dp×4dp inputs, 8 for 3dp
    * corrected prices × 5dp dvol). Keep it as low as the inputs allow:
    * per-group sums must stay below 2^53 in integer representation or
    * wide-decimal→double casts double-round differently across engines.
    */
  def panel(trades: DataFrame, sumScale: Int = 6): DataFrame = {
    /* exact decimal sum rendered as double; the FILTER clause must sit on
     * the aggregate itself, inside the cast. */
    def ds(e: String, filter: String = ""): String = {
      val f = if (filter.isEmpty) "" else s" FILTER (WHERE $filter)"
      s"cast(sum(cast(($e) as decimal(38,$sumScale)))$f as double)"
    }
    // Ratio outputs are RAW double quotients — never rounded. Rounding a
    // double quotient at fixed scale hits half-boundary disagreements
    // across engines (Spark rounds the shortest repr HALF_UP, DuckDB
    // scales-then-rints); the raw quotient of identical decimal-exact
    // operands is bit-identical everywhere. Volume scaling (/1e6) is a
    // decimal scale-shift (*0.000001), not a double division+round.
    val aggs = Seq(
      s"${ds("price")} / count(1) as prc_ew",
      s"${ds("price * dvol")} / nullif(${ds("dvol")}, 0.0) as prc_vw",
      s"${ds("price * qty")} / nullif(${ds("qty")}, 0.0) as prc_vw_par",
      "cast(min_by(price, ord) as double) as prc_first",
      "cast(max_by(price, ord) as double) as prc_last",
      "cast(max(price) as double) as prc_hi",
      "cast(min(price) as double) as prc_lo",
      "count(1) as trade_count",
      // the sum is cast back down to (28,6) before the *0.000001 scale
      // shift so the exact (36,12) product fits — Spark promotes sums to
      // precision 38 and would then clamp the product by dropping scale.
      s"cast(cast(sum(cast(qty as decimal(28,$sumScale))) as decimal(28,$sumScale)) * 0.000001 as double) as qvolume",
      s"cast(cast(sum(cast(dvol as decimal(28,$sumScale))) as decimal(28,$sumScale)) * 0.000001 as double) as dvolume",
      // customer-facing bid side (dealer buys, B/C) — value-weighted
      s"${ds("price * dvol", bid)} / nullif(${ds("dvol", bid)}, 0.0) as prc_bid",
      s"cast(max_by(price, ord) FILTER (WHERE $bid) as double) as bid_last",
      s"count(1) FILTER (WHERE $bid) as bid_count",
      // customer-facing ask side (dealer sells, S/C)
      s"${ds("price * dvol", ask)} / nullif(${ds("dvol", ask)}, 0.0) as prc_ask",
      s"count(1) FILTER (WHERE $ask) as ask_count",
      // execution-time metrics (seconds after midnight): integer sums are
      // exact; raw quotient for the mean
      "cast(sum(secs) as double) / count(1) as time_ew",
      "max_by(secs, ord) as time_last",
      s"cast(sum(secs) FILTER (WHERE $bid) as double)" +
        s" / nullif(count(1) FILTER (WHERE $bid), 0) as bid_time_ew",
      s"max_by(secs, ord) FILTER (WHERE $bid) as bid_time_last"
    )
    trades.groupBy(col("id"), col("dt"))
      .agg(expr(aggs.head), aggs.tail.map(expr): _*)
  }
}
