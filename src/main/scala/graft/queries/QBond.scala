package graft.queries

import graft.Tables

/** Bond analytics (X1) + credit spread (X2), oracle-checked.
  *
  * The reference computes per-bond YTM/duration/convexity with QuantLib
  * (`stage1/helper_functions.py:54-250`). Two halves here:
  *
  *  - the full calendar/Newton machinery (ModifiedFollowing, T+2, four
  *    day-count bases, backward schedules, Newton YTM solve) lives in
  *    [[graft.analytics.BondMath]] / [[graft.analytics.BondAnalytics]],
  *    pinned by analytic golden cases and round-trip specs (BondMathSpec,
  *    BondAnalyticsSpec) — a Newton iteration is not oracle-expressible;
  *  - the DRIVER-GATED queries below run the pricing DIRECTION closed-form
  *    (given ytm → dirty price, Macaulay/modified duration, convexity on a
  *    regular 30/360-style schedule where each period is exactly 1/m
  *    years), which IS expressible in ANSI SQL and hash-checks exactly.
  *
  * Cross-engine exactness: no `pow`/`exp`/`ln` anywhere — libm
  * transcendentals are not bit-identical across engines. The discount
  * factor v^n is built by EXPONENTIATION BY SQUARING (v², v⁴, … v³², then
  * a bit-masked product), and the coupon sums Σk·vᵏ, Σk²·vᵏ use their
  * closed forms — every operation is IEEE +,-,*,/ evaluated in the same
  * order in both engines, so results are bit-identical. The Spark side and
  * the DuckDB oracle are generated from the SAME expression strings.
  *
  * Scale: a pure per-row projection over the scan — no shuffle, fully
  * whole-stage-codegen; the closed form replaces a 40-term per-row loop.
  */
object QBond extends Registry {

  // deterministic bond panel from `orders` keys: frequency m ∈ {1,2,4},
  // life 2..10 years, coupon 2..8 %, ytm 2..6 % — all plain int/double
  // arithmetic (identical text on both engines).
  private val derive = Seq(
    "o_orderkey AS bond_id",
    "CASE o_orderkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS m",
    "2 + o_custkey % 9 AS years",
    "2.0e0 + (o_orderkey % 13) / 2.0e0 AS c_pct",
    "(200 + o_orderkey % 400) / 10000.0e0 AS y")

  private[queries] val vnExpr =
    """(CASE WHEN (n & 1) != 0 THEN v ELSE 1.0e0 END)
      | * (CASE WHEN (n & 2) != 0 THEN p2 ELSE 1.0e0 END)
      | * (CASE WHEN (n & 4) != 0 THEN p4 ELSE 1.0e0 END)
      | * (CASE WHEN (n & 8) != 0 THEN p8 ELSE 1.0e0 END)
      | * (CASE WHEN (n & 16) != 0 THEN p16 ELSE 1.0e0 END)
      | * (CASE WHEN (n & 32) != 0 THEN p32 ELSE 1.0e0 END)""".stripMargin

  // pv: level-annuity + redemption. s1 = Σ_{k=1..n} k·vᵏ,
  // s2 = Σ_{k=1..n} k²·vᵏ (closed forms; w = 1-v).
  private[queries] val steps: Seq[Seq[String]] = Seq(
    Seq("years * m AS n", "c_pct / m AS cpn", "y / m AS i"),
    Seq("1.0e0 / (1.0e0 + i) AS v"),
    Seq("v * v AS p2"),
    Seq("p2 * p2 AS p4"),
    Seq("p4 * p4 AS p8"),
    Seq("p8 * p8 AS p16"),
    Seq("p16 * p16 AS p32"),
    Seq(s"$vnExpr AS vn"),
    Seq("vn * v AS vn1", "vn * v * v AS vn2", "vn * v * v * v AS vn3",
      "(1.0e0 - v) AS w"),
    Seq("cpn * (1.0e0 - vn) / i + 100.0e0 * vn AS pv",
      "v * (1.0e0 - (n + 1) * vn + n * vn1) / (w * w) AS s1",
      "(v + v * v - (n + 1) * (n + 1) * vn1 + (2 * n * n + 2 * n - 1) * vn2 - n * n * vn3) / (w * w * w) AS s2"))

  private[queries] val macExpr = "(cpn / m * s1 + 100.0e0 * n / m * vn) / pv"
  private val outX1 = Seq(
    "bond_id", "n AS n_periods", "y AS ytm", "pv AS prfull",
    s"$macExpr AS mac_dur",
    s"$macExpr / (1.0e0 + i) AS mod_dur",
    "(cpn * (s2 + s1) / (m * m) + 100.0e0 * n * (n + 1) / (m * m) * vn) / (pv * (1.0e0 + i) * (1.0e0 + i)) AS convexity")

  // X2: piecewise-linear par-curve interpolation at the bond's tenor and
  // credit_spread = ytm − curve yield (ComputeCredit shape,
  // stage1/helper_functions.py:309-408). Nodes (1y,5.0%) (2y,4.8%)
  // (5y,4.5%) (7y,4.6%) (10y,4.7%).
  private val tenorExpr = "CAST(2 + o_custkey % 9 AS DOUBLE) AS tenor"
  private[queries] val curveExpr =
    """CASE WHEN tenor <= 1.0e0 THEN 0.05e0
      | WHEN tenor <= 2.0e0 THEN 0.05e0 + (tenor - 1.0e0) / 1.0e0 * (0.048e0 - 0.05e0)
      | WHEN tenor <= 5.0e0 THEN 0.048e0 + (tenor - 2.0e0) / 3.0e0 * (0.045e0 - 0.048e0)
      | WHEN tenor <= 7.0e0 THEN 0.045e0 + (tenor - 5.0e0) / 2.0e0 * (0.046e0 - 0.045e0)
      | WHEN tenor <= 10.0e0 THEN 0.046e0 + (tenor - 7.0e0) / 3.0e0 * (0.047e0 - 0.046e0)
      | ELSE 0.047e0 END""".stripMargin

  /** the oracle's FROM chain: same expression strings, nested subselects */
  private[queries] def nestedSql(inner: Seq[String], chain: Seq[Seq[String]],
      outer: Seq[String]): String = {
    val base = s"(SELECT ${inner.mkString(", ")} FROM orders) t0"
    val from = chain.zipWithIndex.foldLeft(base) { case (acc, (st, ix)) =>
      s"(SELECT *, ${st.mkString(", ")} FROM $acc) t${ix + 1}"
    }
    s"SELECT ${outer.mkString(", ")} FROM $from"
  }

  def qs: Seq[Q] = Seq(

    Q("x1_bond_analytics",
      (s, d) => {
        val base = Tables.orders(s, d).selectExpr(derive: _*)
        steps.foldLeft(base)((df, st) => df.selectExpr("*" +: st: _*))
          .selectExpr(outX1: _*)
      },
      Some(nestedSql(derive, steps, outX1))),

    Q("x2_credit_spread",
      (s, d) => Tables.orders(s, d)
        .selectExpr(derive :+ tenorExpr: _*)
        .selectExpr("*", s"$curveExpr AS curve_y")
        .selectExpr("bond_id", "y AS ytm", "curve_y",
          "y - curve_y AS credit_spread"),
      Some {
        val from =
          s"(SELECT ${(derive :+ tenorExpr).mkString(", ")} FROM orders) t0"
        s"""SELECT bond_id, y AS ytm, curve_y, y - curve_y AS credit_spread
            FROM (SELECT *, $curveExpr AS curve_y FROM $from) t1"""
      })
  )
}
