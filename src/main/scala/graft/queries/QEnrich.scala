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
              LEFT JOIN callable cb ON cb.id = p.id"""))
  )
}
