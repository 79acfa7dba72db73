package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Dedup}
import org.apache.spark.sql.functions._

/** Stage-1-style enrichment stack (SURVEY.md §3.3 step6/step7 shape,
  * J10–J15): the daily panel left-joins static characteristics
  * (broadcast), as-of joins the latest rating event, and coalesce-fills a
  * callable-style flag — all in one pass over the panel.
  */
object QEnrich extends Registry {

  def qs: Seq[Q] = Seq(

    Q("enrich_panel_stack",
      (s, d) => {
        // panel grain: (id, dt) with daily trade count + mean price
        val panel = Trades.df(s, d)
          .groupBy(col("id"), col("dt"))
          .agg(count(lit(1)).as("trade_count"),
            (Tables.dsum(col("price")) / count(lit(1))).as("prc_ew"))
        // static characteristics: one row per id from its first event
        val chars = Dedup.keepFirst(
            Tables.events(s, d).select(col("user_id").as("id"),
              col("event_id").as("ord"), col("event_type")),
            keys = Seq("id"), order = Seq(col("ord")))
          .select(col("id"), col("event_type").as("first_type"))
        // rating events: purchases carry a rating value
        val ratings = Dedup.keepLast(
          Tables.events(s, d).filter(col("event_type") === "purchase")
            .select(col("user_id").as("id"),
              to_date(col("ts")).as("r_dt"), col("event_id").as("r_ord"),
              col("value").cast("decimal(18,2)").as("rating")),
          keys = Seq("id", "r_dt"), order = Seq(col("r_ord")))
        // callable-style flag: ids that ever error
        val callable = Tables.events(s, d)
          .filter(col("event_type") === "error")
          .select(col("user_id").as("id")).distinct()
          .withColumn("callable", lit(1))
        val enriched = AsOfJoin.backward(
            panel.join(broadcast(chars), Seq("id"), "left"),
            ratings,
            by = Seq("id"), leftOn = "dt", rightOn = "r_dt",
            payload = Seq("rating"), rightTieBreak = Seq("r_ord"))
          .join(broadcast(callable), Seq("id"), "left")
        enriched.select(col("id"), col("dt"), col("trade_count"),
          col("prc_ew"), col("first_type"),
          col("rating").cast("double").as("rating"),
          coalesce(col("callable"), lit(0)).as("callable"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              panel AS (
                SELECT id, dt, count(*) AS trade_count,
                       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS prc_ew
                FROM tr GROUP BY id, dt),
              chars AS (
                SELECT id, event_type AS first_type FROM (
                  SELECT user_id AS id, event_type,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY event_id) AS rn
                  FROM events) x WHERE rn = 1),
              ratings AS (
                SELECT id, r_dt, rating FROM (
                  SELECT user_id AS id, CAST(ts AS DATE) AS r_dt,
                         CAST(value AS DECIMAL(18,2)) AS rating,
                         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                           ORDER BY event_id DESC) AS rn
                  FROM events WHERE event_type = 'purchase') x WHERE rn = 1),
              callable AS (
                SELECT DISTINCT user_id AS id, 1 AS callable
                FROM events WHERE event_type = 'error')
              SELECT p.id, p.dt, p.trade_count, p.prc_ew, c.first_type,
                     CAST(r.rating AS DOUBLE) AS rating,
                     coalesce(cb.callable, 0) AS callable
              FROM panel p
              LEFT JOIN chars c ON c.id = p.id
              ASOF LEFT JOIN ratings r ON r.id = p.id AND p.dt >= r.r_dt
              LEFT JOIN callable cb ON cb.id = p.id""")),

    // J13 + composite ratings (stage1/stage1_pipeline.py:816-832, 927-956):
    // agency rating tables join INNER to the issue master on issue_id to
    // pick up the cusip (J13), then the composite derivation: Moody's >= 21
    // collapses to 22 (NR band), sp/mdy composites coalesce across
    // agencies, comp_rating is the null-skipping two-column mean — exactly
    // pandas' np.where + mean(axis=1) semantics. All small-int arithmetic;
    // the ratings sides here are deterministic derivations from lineitem
    // keys (l_linenumber 1 → S&P, 2 → Moody's, with key-based null gaps).
    Q("enrich_ratings_composite",
      (s, d) => {
        val issues = Tables.orders(s, d)
          .select(col("o_orderkey").as("issue_id"),
            expr("concat('CUSIP', lpad(CAST(o_custkey AS STRING), 9, '0'))")
              .as("cusip_id"))
        val sp = Tables.lineitem(s, d).filter(col("l_linenumber") === 1)
          .select(col("l_orderkey").as("issue_id"),
            expr("CASE WHEN l_partkey % 5 = 0 THEN NULL ELSE CAST(1 + l_partkey % 22 AS INT) END")
              .as("sp_rating"))
        val mdy = Tables.lineitem(s, d).filter(col("l_linenumber") === 2)
          .select(col("l_orderkey").as("issue_id"),
            expr("CASE WHEN l_suppkey % 7 = 0 THEN NULL ELSE CAST(1 + l_suppkey % 23 AS INT) END")
              .as("mdy_rating"))
        sp.join(issues, Seq("issue_id"), "inner")   // J13: ratings -> cusip
          .join(mdy, Seq("issue_id"), "left")
          .withColumn("mdy_adj",
            expr("CASE WHEN mdy_rating >= 21 THEN 22 ELSE mdy_rating END"))
          .withColumn("spc_rating", coalesce(col("sp_rating"), col("mdy_adj")))
          .withColumn("mdc_rating", coalesce(col("mdy_adj"), col("sp_rating")))
          .withColumn("comp_rating",
            expr("""(coalesce(spc_rating, 0) + coalesce(mdc_rating, 0))
                    / nullif((CASE WHEN spc_rating IS NULL THEN 0 ELSE 1 END)
                           + (CASE WHEN mdc_rating IS NULL THEN 0 ELSE 1 END), 0)"""))
          .withColumn("has_rating",
            expr("CASE WHEN comp_rating IS NULL THEN 0 ELSE 1 END"))
          .select(col("issue_id"), col("cusip_id"), col("sp_rating"),
            col("mdy_rating"), col("spc_rating"), col("mdc_rating"),
            col("comp_rating"), col("has_rating"))
      },
      Some("""WITH issues AS (
                SELECT o_orderkey AS issue_id,
                       concat('CUSIP', lpad(CAST(o_custkey AS VARCHAR), 9, '0')) AS cusip_id
                FROM orders),
              sp AS (
                SELECT l_orderkey AS issue_id,
                       CASE WHEN l_partkey % 5 = 0 THEN NULL
                            ELSE CAST(1 + l_partkey % 22 AS INT) END AS sp_rating
                FROM lineitem WHERE l_linenumber = 1),
              mdy AS (
                SELECT l_orderkey AS issue_id,
                       CASE WHEN l_suppkey % 7 = 0 THEN NULL
                            ELSE CAST(1 + l_suppkey % 23 AS INT) END AS mdy_rating
                FROM lineitem WHERE l_linenumber = 2),
              j AS (
                SELECT s.issue_id, i.cusip_id, s.sp_rating, m.mdy_rating,
                       CASE WHEN m.mdy_rating >= 21 THEN 22
                            ELSE m.mdy_rating END AS mdy_adj
                FROM sp s
                JOIN issues i ON s.issue_id = i.issue_id
                LEFT JOIN mdy m ON s.issue_id = m.issue_id),
              cmp AS (
                SELECT *, coalesce(sp_rating, mdy_adj) AS spc_rating,
                          coalesce(mdy_adj, sp_rating) AS mdc_rating
                FROM j)
              SELECT issue_id, cusip_id, sp_rating, mdy_rating, spc_rating,
                     mdc_rating,
                     (coalesce(spc_rating, 0) + coalesce(mdc_rating, 0))
                       / nullif((CASE WHEN spc_rating IS NULL THEN 0 ELSE 1 END)
                              + (CASE WHEN mdc_rating IS NULL THEN 0 ELSE 1 END), 0)
                       AS comp_rating,
                     CASE WHEN (coalesce(spc_rating, 0) + coalesce(mdc_rating, 0))
                       / nullif((CASE WHEN spc_rating IS NULL THEN 0 ELSE 1 END)
                              + (CASE WHEN mdc_rating IS NULL THEN 0 ELSE 1 END), 0)
                       IS NULL THEN 0 ELSE 1 END AS has_rating
              FROM cmp"""))
  )
}
