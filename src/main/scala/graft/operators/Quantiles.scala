package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based ("discrete") group quantiles and winsorization.
  *
  * The reference winsorizes ytm/credit_spread per trade date with
  * `groupby.transform(clip at q0.005/q0.995)` (`stage1/stage1_pipeline.py:
  * 1950-1961`) and builds descriptive P1/P5/P95/P99 tables
  * (`stage1/helper_functions.py:3664-3751`).
  *
  * We define quantile(q) as the element at rank `max(1, ceil(q*n))` under a
  * TOTAL order — a pure rank pick, no interpolation. Rationale: interpolated
  * quantiles of doubles are not bit-stable across engines (Spark `percentile`
  * vs DuckDB `quantile_cont` differ in last-ulp arithmetic), while a rank
  * pick returns an actual data value and is exactly reproducible in ANSI SQL
  * — which is what the DuckDB oracle gate needs. Scale: one shuffle by the
  * group keys; both windows share that partitioning so Catalyst plans a
  * single sort+exchange. The per-group window SORT means group cardinality
  * must grow with the data (the reference's per-trade-date keys do): on a
  * few-large-groups input a single task sorts a constant fraction of the
  * table — re-key to a finer grain (as a6/a8 do) rather than feeding a
  * 3-value key at 100 TB.
  */
object Quantiles {

  /** Adds `<out>` columns: for each (name, q), the group-quantile of `valueCol`. */
  def withGroupQuantiles(
      df: DataFrame,
      groups: Seq[String],
      valueCol: String,
      tieBreak: Seq[Column],
      qs: Seq[(String, Double)]): DataFrame = {
    val wOrd = Window.partitionBy(groups.map(col): _*)
      .orderBy(col(valueCol).asc +: tieBreak.map(_.asc): _*)
    val wGrp = Window.partitionBy(groups.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rn = "__q_rn"
    val n = "__q_n"
    val base = df
      .withColumn(rn, row_number().over(wOrd))
      .withColumn(n, count(lit(1)).over(wGrp))
    val out = qs.foldLeft(base) { case (d, (name, q)) =>
      // rank computed in exact decimal, not double: 0.95*20 in binary is
      // 19.000000000000004 so a double ceil would pick rank 20 where the
      // documented max(1, ceil(q*n)) semantics (and DuckDB, whose bare
      // fractional literals are DECIMAL) say 19.
      val target = greatest(lit(1L), ceil(lit(BigDecimal(q)) * col(n)))
      d.withColumn(name,
        max(when(col(rn) === target, col(valueCol))).over(wGrp))
    }
    out.drop(rn, n)
  }

  /** Winsorize: clip `valueCol` into its group [qLo, qHi] rank-quantiles,
    * written to `outCol`.
    */
  def winsorize(
      df: DataFrame,
      groups: Seq[String],
      valueCol: String,
      tieBreak: Seq[Column],
      qLo: Double,
      qHi: Double,
      outCol: String): DataFrame = {
    val lo = "__w_lo"
    val hi = "__w_hi"
    withGroupQuantiles(df, groups, valueCol, tieBreak, Seq(lo -> qLo, hi -> qHi))
      .withColumn(outCol, least(greatest(col(valueCol), col(lo)), col(hi)))
      .drop(lo, hi)
  }
}
