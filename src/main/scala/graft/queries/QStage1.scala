package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Dedup, Quantiles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed Stage-1 END-TO-END chain — the reference's flagship
  * deliverable (`stage1/stage1_pipeline.py:2978-3020` `run_all_steps`):
  * one entry point that takes raw trades to the enriched analytical
  * panel. Every stage is an operator that also has its own standalone
  * CORRECTNESS row; this chain is the composition, oracle-replayed stage
  * by stage in one DuckDB CTE pipeline (the `tx_corpus_build` pattern):
  *
  *   1. panel stack + A12 priority dedup (enhanced/standard TRACE stack,
  *      `stage1_pipeline.py:376-418` shape)
  *   2. FISD master merge + F11 bond-type screen (step4)
  *   3. X1 closed-form bond analytics + X2 curve spread (step5)
  *   4. J11 as-of ratings AND amount-outstanding in ONE pass
  *      ([[AsOfJoin.backwardMulti]] — the panel shuffles once, not per
  *      enrichment; steps 6 + the 739-759 amount merge), with the
  *      offering-amount coalesce fallback
  *   5. J14 callable flag + J15 issuer->permno linker month-join (step7)
  *   6. W10 anomaly + W14 first-change error flags (step8 detectors)
  *   7. F12 final price filters (step9)
  *   8. A8 cross-sectional winsorization (step10 table prep)
  */
object QStage1 extends Registry {

  /** The user-facing entry point: the enriched daily panel. */
  def enrichedPanel(s: SparkSession, d: String): DataFrame = {
    val tr = Trades.df(s, d)

    // 1 ── stack two overlapping panel sources, A12 priority dedup:
    // the richer source (src=1) wins where both carry the same trade
    val stacked = tr.filter(col("trc_st") =!= "X").withColumn("src", lit(1))
      .unionByName(tr.filter(col("side") === "S").withColumn("src", lit(2)))
    val panel = Dedup.keepFirst(stacked, keys = Seq("id", "ord"),
        order = Seq(col("src")))
      .groupBy(col("id"), col("dt"))
      .agg(count(lit(1)).as("trade_count"),
        (Tables.dsum4(col("dvol")) / Tables.dsum(col("qty"))).as("prc_vw"))

    // 2 ── FISD-style bond master (deterministic terms per id) + F11
    val fisd = tr.select(col("id")).distinct().selectExpr(
      "id",
      "CASE id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS m",
      "2 + id % 9 AS years",
      "2.0e0 + (id % 13) / 2.0e0 AS c_pct",
      "(200 + id % 400) / 10000.0e0 AS y",
      "CASE WHEN id % 19 = 0 THEN 'C' ELSE 'B' END AS bond_type",
      "CAST((id % 997 + 1) * 1000 AS DOUBLE) AS offering_amt")
    val merged = panel.join(broadcast(fisd), Seq("id"))
      .filter(col("bond_type") =!= "C")

    // 3 ── X1 analytics + X2 spread: the SAME closed-form expression
    // strings as the standalone x1/x2 rows (QBond.steps/curveExpr) —
    // bit-identical across engines, pure projection, no shuffle
    val analytics = QBond.steps.foldLeft(merged)(
        (df, st) => df.selectExpr("*" +: st: _*))
      .selectExpr("*",
        s"${QBond.macExpr} AS mac_dur",
        s"${QBond.macExpr} / (1.0e0 + i) AS mod_dur",
        "(cpn * (s2 + s1) / (m * m) + 100.0e0 * n * (n + 1) / (m * m) * vn) / (pv * (1.0e0 + i) * (1.0e0 + i)) AS convexity",
        "CAST(years AS DOUBLE) AS tenor")
      .selectExpr("*", s"${QBond.curveExpr} AS curve_y")
      .withColumn("credit_spread", col("y") - col("curve_y"))

    // 4 ── ratings + amount-outstanding as-of enrichment in ONE pass.
    // No keepLast pre-dedup: the per-source tieBreak folds the
    // latest-event-per-day rule into the as-of window's own sort (among
    // equal dates the max-ord row's payload wins the forward fill), so
    // the event tables reach the union un-shuffled — two fewer
    // exchanges than dedup-then-join, same values (the oracle still
    // replays the dedup formulation).
    val ev = Tables.events(s, d)
    val ratings = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("id"), to_date(col("ts")).as("r_dt"),
        col("event_id").as("r_ord"),
        col("value").cast("decimal(18,2)").cast("double").as("rating"))
    val amounts = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("id"), to_date(col("ts")).as("a_dt"),
        col("event_id").as("a_ord"),
        col("value").cast("decimal(18,2)").cast("double").as("amt_out"))
    val asOf = AsOfJoin.backwardMulti(analytics, by = Seq("id"), leftOn = "dt",
      rights = Seq(
        AsOfJoin.Right(ratings, on = "r_dt", payload = Seq("rating"),
          tieBreak = Seq("r_ord")),
        AsOfJoin.Right(amounts, on = "a_dt", payload = Seq("amt_out"),
          tieBreak = Seq("a_ord"))))
      .withColumn("amt_filled", coalesce(col("amt_out"), col("offering_amt")))

    // 5 ── J14 callable flag + J15 issuer→permno monthly linker
    val callable = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("id")).distinct()
      .withColumn("callable", lit(1))
    val obs = ev.filter(col("event_type") === "signup")
      .select((col("user_id") % 31).as("issuer6"),
        trunc(to_date(col("ts")), "MM").as("month_start"), col("user_id"))
      .groupBy(col("issuer6"), col("month_start"))
      .agg(min(col("user_id")).as("permno"))
    val lastMonth = obs.agg(max(col("month_start")).as("mx"))
    val ext = obs.join(broadcast(lastMonth), col("month_start") === col("mx"))
      .select(col("issuer6"), col("permno"),
        explode(array((1 to 3).map(i =>
          add_months(col("month_start"), i)): _*)).as("month_start"))
    val linker = Dedup.keepFirst(
        obs.select("issuer6", "month_start", "permno")
          .unionByName(ext.select("issuer6", "month_start", "permno")),
        keys = Seq("issuer6", "month_start"), order = Seq(col("permno")))
      .withColumn("yyyymm", date_format(col("month_start"), "yyyyMM"))
      .select("issuer6", "yyyymm", "permno")
    val linked = asOf
      .join(broadcast(callable), Seq("id"), "left")
      .withColumn("callable", coalesce(col("callable"), lit(0)))
      .withColumn("issuer6", col("id") % 31)
      .withColumn("yyyymm", date_format(col("dt"), "yyyyMM"))
      .join(broadcast(linker), Seq("issuer6", "yyyymm"), "left")

    // 6 ── W10 anomaly (±5-row strictly-higher median) + W14 first-change
    // flags over the panel: one exchange by id, shared sort by dt
    val arr =
      """sort_array(filter(collect_list(prc_vw) over
         (partition by id order by dt rows between 5 preceding and 5 following),
         x -> x > prc_vw))"""
    val win = Window.partitionBy(col("id")).orderBy(col("dt"))
    val flagged = linked
      .withColumn("hi_med", expr(
        s"""case when size($arr) = 0 then null
            when size($arr) % 2 = 1 then element_at($arr, cast(size($arr) div 2 + 1 as int))
            else (element_at($arr, cast(size($arr) div 2 as int))
                  + element_at($arr, cast(size($arr) div 2 + 1 as int))) / 2 end"""))
      .withColumn("anomaly",
        when(col("hi_med") / expr("nullif(prc_vw, 0.0d)") >= 3, 1).otherwise(0))
      .withColumn("rn", row_number().over(win))
      .withColumn("adiff", abs(col("prc_vw") - lag(col("prc_vw"), 1).over(win)))
      .withColumn("prc_dip",
        when(col("rn") === 2 && col("adiff") > 35, 1).otherwise(0))

    // 7 ── F12 final screens
    val screened = flagged.filter(
      col("prc_vw") >= 5 && col("prc_vw") <= 1000 &&
        col("anomaly") === 0 && col("prc_dip") === 0)

    // 8 ── A8 cross-sectional winsorization of the surviving panel
    Quantiles.winsorize(screened,
        groups = Seq("dt"), valueCol = "prc_vw",
        tieBreak = Seq(col("id")),
        qLo = 0.005, qHi = 0.995, outCol = "prc_w")
      .select(col("id"), col("dt"), col("trade_count"), col("prc_vw"),
        col("prc_w"), col("y").as("ytm"), col("pv").as("prfull"),
        col("mac_dur"), col("mod_dur"), col("convexity"),
        col("credit_spread"), col("rating"), col("amt_filled"),
        col("callable"), col("permno"))
  }

  /** nested-select fold of QBond's step chain over a CTE name */
  private def foldSql(base: String, chain: Seq[Seq[String]]): String =
    chain.zipWithIndex.foldLeft(base) { case (acc, (st, ix)) =>
      s"(SELECT *, ${st.mkString(", ")} FROM $acc) s${ix + 1}"
    }

  private val oracle: String = {
    val analyticsFrom = foldSql("merged", QBond.steps)
    s"""WITH tr AS (${Trades.sql}),
        stacked AS (
          SELECT *, 1 AS src FROM tr WHERE trc_st <> 'X'
          UNION ALL
          SELECT *, 2 AS src FROM tr WHERE side = 'S'),
        dedup AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY id, ord ORDER BY src) AS drn
            FROM stacked) x WHERE drn = 1),
        panel AS (
          SELECT id, dt, count(*) AS trade_count,
                 CAST(sum(CAST(dvol AS DECIMAL(28,4))) AS DOUBLE)
                   / CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS prc_vw
          FROM dedup GROUP BY id, dt),
        fisd AS (
          SELECT id,
                 CASE id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS m,
                 2 + id % 9 AS years,
                 2.0e0 + (id % 13) / 2.0e0 AS c_pct,
                 (200 + id % 400) / 10000.0e0 AS y,
                 CASE WHEN id % 19 = 0 THEN 'C' ELSE 'B' END AS bond_type,
                 CAST((id % 997 + 1) * 1000 AS DOUBLE) AS offering_amt
          FROM (SELECT DISTINCT id FROM tr)),
        merged AS (
          SELECT p.*, f.m, f.years, f.c_pct, f.y, f.bond_type, f.offering_amt
          FROM panel p JOIN fisd f USING (id) WHERE f.bond_type <> 'C'),
        analytics AS (
          SELECT *, ${QBond.macExpr} AS mac_dur,
                 ${QBond.macExpr} / (1.0e0 + i) AS mod_dur,
                 (cpn * (s2 + s1) / (m * m) + 100.0e0 * n * (n + 1) / (m * m) * vn) / (pv * (1.0e0 + i) * (1.0e0 + i)) AS convexity,
                 CAST(years AS DOUBLE) AS tenor
          FROM $analyticsFrom),
        withcurve AS (
          SELECT *, ${QBond.curveExpr} AS curve_y FROM analytics),
        spreads AS (
          SELECT *, y - curve_y AS credit_spread FROM withcurve),
        ratings AS (
          SELECT id, r_dt, rating FROM (
            SELECT user_id AS id, CAST(ts AS DATE) AS r_dt,
                   CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS rating,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                     ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase') x WHERE rn = 1),
        amounts AS (
          SELECT id, a_dt, amt_out FROM (
            SELECT user_id AS id, CAST(ts AS DATE) AS a_dt,
                   CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS amt_out,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                     ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click') x WHERE rn = 1),
        enriched AS (
          SELECT s.*, r.rating, a.amt_out,
                 coalesce(a.amt_out, s.offering_amt) AS amt_filled
          FROM spreads s
          ASOF LEFT JOIN ratings r ON r.id = s.id AND s.dt >= r.r_dt
          ASOF LEFT JOIN amounts a ON a.id = s.id AND s.dt >= a.a_dt),
        callable AS (
          SELECT DISTINCT user_id AS id, 1 AS callable
          FROM events WHERE event_type = 'error'),
        obs AS (
          SELECT user_id % 31 AS issuer6,
                 date_trunc('month', CAST(ts AS DATE)) AS month_start,
                 min(user_id) AS permno
          FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
        mx AS (SELECT max(month_start) AS mx FROM obs),
        ext AS (
          SELECT issuer6, permno,
                 CAST(month_start + to_months(CAST(i AS INT)) AS DATE) AS month_start
          FROM obs, mx, generate_series(1, 3) g(i)
          WHERE obs.month_start = mx.mx),
        linker AS (
          SELECT issuer6, strftime(month_start, '%Y%m') AS yyyymm, permno
          FROM (
            SELECT *, row_number() OVER (PARTITION BY issuer6, month_start
                        ORDER BY permno) AS rn
            FROM (SELECT issuer6, month_start, permno FROM obs
                  UNION ALL
                  SELECT issuer6, month_start, permno FROM ext) u) x
          WHERE rn = 1),
        linked AS (
          SELECT a.*, coalesce(cb.callable, 0) AS callable, lk.permno
          FROM enriched a
          LEFT JOIN callable cb ON cb.id = a.id
          LEFT JOIN linker lk ON lk.issuer6 = a.id % 31
                             AND lk.yyyymm = strftime(a.dt, '%Y%m')),
        flagged AS (
          SELECT *,
                 CASE WHEN hi_med / nullif(prc_vw, 0.0e0) >= 3 THEN 1 ELSE 0 END AS anomaly,
                 CASE WHEN frn = 2 AND adiff > 35 THEN 1 ELSE 0 END AS prc_dip
          FROM (
            SELECT *,
                   CASE WHEN hiarr IS NULL OR len(hiarr) = 0 THEN NULL
                        WHEN len(hiarr) % 2 = 1 THEN hiarr[len(hiarr) // 2 + 1]
                        ELSE (hiarr[len(hiarr) // 2] + hiarr[len(hiarr) // 2 + 1]) / 2
                   END AS hi_med
            FROM (
              SELECT *,
                     list_sort(list_filter(list(prc_vw) OVER
                       (PARTITION BY id ORDER BY dt
                        ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING),
                       x -> x > prc_vw)) AS hiarr,
                     row_number() OVER (PARTITION BY id ORDER BY dt) AS frn,
                     abs(prc_vw - lag(prc_vw, 1) OVER
                       (PARTITION BY id ORDER BY dt)) AS adiff
              FROM linked) w1) w2),
        screened AS (
          SELECT * FROM flagged
          WHERE prc_vw >= 5 AND prc_vw <= 1000 AND anomaly = 0 AND prc_dip = 0),
        ranked AS (
          SELECT *,
                 row_number() OVER (PARTITION BY dt ORDER BY prc_vw, id) AS wrn,
                 count(*) OVER (PARTITION BY dt) AS wn
          FROM screened),
        bounds AS (
          SELECT *,
                 max(CASE WHEN wrn = greatest(1, CAST(ceil(0.005 * wn) AS BIGINT))
                          THEN prc_vw END) OVER (PARTITION BY dt) AS wlo,
                 max(CASE WHEN wrn = greatest(1, CAST(ceil(0.995 * wn) AS BIGINT))
                          THEN prc_vw END) OVER (PARTITION BY dt) AS whi
          FROM ranked)
        SELECT id, dt, trade_count, prc_vw,
               least(greatest(prc_vw, wlo), whi) AS prc_w,
               y AS ytm, pv AS prfull, mac_dur, mod_dur, convexity,
               credit_spread, rating, amt_filled, callable, permno
        FROM bounds"""
  }

  def qs: Seq[Q] = Seq(
    Q("tp_stage1_panel", (s, d) => enrichedPanel(s, d), Some(oracle)))
}
