package graft.queries

import graft.Tables
import graft.analytics.BondAnalytics
import org.apache.spark.sql.functions._

/** Bond analytics (X1) + credit spread (X2) over a deterministic synthetic
  * bond panel derived from `orders`. No SQL oracle — the Newton solve and
  * business calendar are not reasonably expressible in DuckDB; correctness
  * is pinned by BondMathSpec's analytic golden cases (zero-coupon closed
  * form, par-bond identity, price round-trip, duration relations). The
  * driver records a rows-only check.
  */
object QBond extends Registry {

  def qs: Seq[Q] = Seq(

    Q("x1_bond_analytics",
      (s, d) => {
        val bonds = Tables.orders(s, d).select(
          col("o_orderkey").as("bond_id"),
          (lit(70.0) + col("o_totalprice") % 60).as("pr"),
          (col("o_custkey") % 12 / 2.0).as("coupon"),
          when(col("o_orderkey") % 17 === 0, "Z").otherwise("F").as("coupon_type"),
          when(col("o_orderkey") % 5 === 0, 1)
            .when(col("o_orderkey") % 5 === 1, 4)
            .otherwise(2).as("frequency"),
          element_at(
            array(lit("30/360"), lit("ACT/ACT"), lit("ACT/360"), lit("ACT/365")),
            (col("o_orderkey") % 4 + 1).cast("int")).as("day_count"),
          trunc(to_date(col("o_orderdate")), "MM").as("dated_date"),
          add_months(to_date(col("o_orderdate")),
            (lit(24) + col("o_custkey") % 8 * 12).cast("int")).as("maturity"),
          date_add(to_date(col("o_orderdate")), 30).as("trd_exctn_dt"))
        BondAnalytics.withAnalytics(bonds,
            col("pr"), col("coupon"), col("coupon_type"), col("frequency"),
            col("day_count"), col("dated_date"), col("maturity"),
            col("trd_exctn_dt"))
          .filter(col("ytm").isNotNull)
          .select(col("bond_id"), col("ytm"), col("prclean"), col("prfull"),
            col("acclast"), col("mac_dur"), col("mod_dur"), col("convexity"))
      },
      None),

    // X2 composition: credit spread = ytm − interpolated curve yield at the
    // bond's remaining tenor (the ComputeCredit shape,
    // stage1/helper_functions.py:309-408).
    Q("x2_credit_spread",
      (s, d) => {
        // one analytics pass: reuse the x1 result and derive the tenor from
        // the same deterministic bond panel WITHOUT a second UDF pipeline
        val withY = qs.head.fn(s, d)
        val bonds = Tables.orders(s, d).select(
          col("o_orderkey").as("bond_id"),
          (datediff(add_months(to_date(col("o_orderdate")),
            (lit(24) + col("o_custkey") % 8 * 12).cast("int")),
            to_date(col("o_orderdate"))) / 365.25).as("tenor"))
        val nodes = Seq(1.0 -> 0.050, 2.0 -> 0.048, 5.0 -> 0.045,
          7.0 -> 0.046, 10.0 -> 0.047)
        val x = col("tenor")
        val interp = nodes.sliding(2).map { case Seq((x0, y0), (x1, y1)) =>
          (x0, x1, y0, y1)
        }.foldLeft(when(x <= nodes.head._1, nodes.head._2)) {
          case (acc, (x0, x1, y0, y1)) =>
            acc.when(x <= x1, lit(y0) + (x - x0) / (x1 - x0) * (y1 - y0))
        }.otherwise(nodes.last._2)
        withY.join(bonds, Seq("bond_id"))
          .withColumn("curve_y", interp)
          .withColumn("credit_spread", col("ytm") - col("curve_y"))
          .select(col("bond_id"), col("ytm"), col("curve_y"), col("credit_spread"))
      },
      None)
  )
}
