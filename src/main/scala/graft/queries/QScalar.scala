package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.8, §2.11 X2/X4/X5): string, date,
  * math, conditional/null handling, curve interpolation, time parsing and
  * code-map lookups — all pure Catalyst expressions inside whole-stage
  * codegen, no UDFs.
  */
object QScalar extends Registry {

  def qs: Seq[Q] = Seq(

    // String functions: concat_ws merge keys, substring issuer-cusip,
    // trim, rlike contains, regexp_replace recodes, lower
    // (stage0/create_daily_enhanced_trace.py:1679-1695, 2373-2376;
    // stage0/create_daily_standard_trace.py:1742-1749).
    Q("x_string_funcs",
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey"),
          concat_ws("_", col("p_brand"), col("p_type")).as("merge_key"),
          substring(col("p_name"), 1, 6).as("name6"),
          trim(col("p_name")).as("name_trim"),
          when(col("p_name").rlike("widget|gizmo"), 1).otherwise(0).as("is_widgety"),
          regexp_replace(col("p_type"), "PROMO", "P").as("type_recode"),
          lower(col("p_brand")).as("brand_lc"),
          length(col("p_name")).as("name_len")),
      Some("""SELECT p_partkey,
                     concat_ws('_', p_brand, p_type) AS merge_key,
                     substring(p_name, 1, 6) AS name6,
                     trim(p_name) AS name_trim,
                     CASE WHEN regexp_matches(p_name, 'widget|gizmo') THEN 1 ELSE 0 END AS is_widgety,
                     regexp_replace(p_type, 'PROMO', 'P', 'g') AS type_recode,
                     lower(p_brand) AS brand_lc,
                     length(p_name) AS name_len
              FROM part""")),

    // Date/time functions: year/month, yyyymmdd format, month trunc,
    // month-end alignment, year-fraction tenor
    // (stage1/stage1_pipeline.py:1031-1050; stage1/helper_functions.py:595-607).
    Q("x_date_funcs",
      (s, d) => Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_format(col("o_orderdate"), "yyyyMMdd").as("yyyymmdd"),
          trunc(to_date(col("o_orderdate")), "MM").as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          (datediff(to_date(col("o_orderdate")), lit("1992-01-01")) / 365.25)
            .as("tenor_years")),
      Some("""SELECT o_orderkey,
                     CAST(extract(year FROM o_orderdate) AS INT) AS yr,
                     CAST(extract(month FROM o_orderdate) AS INT) AS mo,
                     strftime(o_orderdate, '%Y%m%d') AS yyyymmdd,
                     CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                     CAST(last_day(o_orderdate) AS DATE) AS month_end,
                     date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) / 365.25 AS tenor_years
              FROM orders""")),

    // X4 — 'HH:MM:SS' string parse → validated seconds-after-midnight
    // (stage0/create_daily_enhanced_trace.py:128-163): split + casts +
    // bounds checks; invalid → NULL. Round-trips through a formatted
    // string to exercise the parse, not just hour()/minute().
    Q("x4_time_to_seconds",
      (s, d) => Tables.events(s, d)
        .withColumn("tm", date_format(col("ts"), "HH:mm:ss"))
        .withColumn("parts", split(col("tm"), ":"))
        .withColumn("secs",
          when(size(col("parts")) === 3,
            col("parts").getItem(0).cast("int") * 3600 +
              col("parts").getItem(1).cast("int") * 60 +
              col("parts").getItem(2).cast("int")))
        .withColumn("secs",
          when(col("secs").between(0, 86399), col("secs")))
        .select(col("event_id"), col("tm"), col("secs")),
      Some("""WITH t AS (
                SELECT event_id, strftime(ts, '%H:%M:%S') AS tm FROM events),
              p AS (
                SELECT event_id, tm, string_split(tm, ':') AS parts FROM t),
              v AS (
                SELECT event_id, tm,
                       CASE WHEN len(parts) = 3 THEN
                         CAST(parts[1] AS INT) * 3600 + CAST(parts[2] AS INT) * 60
                           + CAST(parts[3] AS INT) END AS secs
                FROM p)
              SELECT event_id, tm,
                     CASE WHEN secs BETWEEN 0 AND 86399 THEN secs END AS secs
              FROM v""")),

    // Math + conditional/null: abs, sign, scaling, coalesce-fill,
    // when-recode, greatest/least row-wise spread check (W13 intraday
    // inconsistency, stage1/helper_functions.py:1231-1273).
    Q("x_math_conditional",
      (s, d) => Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
          (col("l_discount") * 100).cast("int").as("disc_pct"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("NONE")).as("flag_filled"),
          when(col("l_linestatus") === "O", "OPEN")
            .when(col("l_linestatus") === "F", "FINAL")
            .otherwise("OTHER").as("status_recode"),
          greatest(col("l_extendedprice"), col("l_quantity") * 1000).as("hi_val"),
          least(col("l_extendedprice"), col("l_quantity") * 1000).as("lo_val"),
          when(
            least(col("l_extendedprice"), col("l_quantity") * 1000) < 20000 &&
              (greatest(col("l_extendedprice"), col("l_quantity") * 1000) -
                least(col("l_extendedprice"), col("l_quantity") * 1000)) /
                ((col("l_extendedprice") + col("l_quantity") * 1000) / 2) > 0.75,
            1).otherwise(0).as("inconsistent")),
      Some("""SELECT l_orderkey, l_linenumber,
                     abs(l_quantity - 25) AS qty_dev,
                     CAST(sign(l_quantity - 25) AS INT) AS qty_sign,
                     CAST(l_discount * 100 AS INT) AS disc_pct,
                     coalesce(nullif(l_returnflag, 'N'), 'NONE') AS flag_filled,
                     CASE WHEN l_linestatus = 'O' THEN 'OPEN'
                          WHEN l_linestatus = 'F' THEN 'FINAL'
                          ELSE 'OTHER' END AS status_recode,
                     greatest(l_extendedprice, l_quantity * 1000) AS hi_val,
                     least(l_extendedprice, l_quantity * 1000) AS lo_val,
                     CASE WHEN least(l_extendedprice, l_quantity * 1000) < 20000
                            AND (greatest(l_extendedprice, l_quantity * 1000)
                                 - least(l_extendedprice, l_quantity * 1000))
                                / ((l_extendedprice + l_quantity * 1000) / 2) > 0.75
                          THEN 1 ELSE 0 END AS inconsistent
              FROM lineitem""")),

    // X2 — piecewise-linear curve interpolation over fixed nodes
    // (ComputeCredit, stage1/helper_functions.py:309-408): np.interp
    // restated as a nested-when chain with explicit (x-x0)/(x1-x0)
    // algebra; flat extrapolation beyond the end nodes.
    Q("x2_curve_interp",
      (s, d) => {
        val nodes = Seq(1.0 -> 0.050, 10.0 -> 0.045, 20.0 -> 0.042,
          30.0 -> 0.046, 40.0 -> 0.049, 50.0 -> 0.053)
        val x = col("l_quantity")
        val segs = nodes.sliding(2).map { case Seq((x0, y0), (x1, y1)) =>
          (x0, x1, y0, y1)
        }.toSeq
        val interp = segs.foldLeft(
          when(x <= nodes.head._1, nodes.head._2)) { case (acc, (x0, x1, y0, y1)) =>
          acc.when(x <= x1,
            lit(y0) + (x - x0) / (x1 - x0) * (y1 - y0))
        }.otherwise(nodes.last._2)
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            interp.as("curve_y"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
                CASE WHEN l_quantity <= 1.0e0 THEN 0.05e0
                     WHEN l_quantity <= 10.0e0 THEN 0.05e0 + (l_quantity - 1.0e0) / (10.0e0 - 1.0e0) * (0.045e0 - 0.05e0)
                     WHEN l_quantity <= 20.0e0 THEN 0.045e0 + (l_quantity - 10.0e0) / (20.0e0 - 10.0e0) * (0.042e0 - 0.045e0)
                     WHEN l_quantity <= 30.0e0 THEN 0.042e0 + (l_quantity - 20.0e0) / (30.0e0 - 20.0e0) * (0.046e0 - 0.042e0)
                     WHEN l_quantity <= 40.0e0 THEN 0.046e0 + (l_quantity - 30.0e0) / (40.0e0 - 30.0e0) * (0.049e0 - 0.046e0)
                     WHEN l_quantity <= 50.0e0 THEN 0.049e0 + (l_quantity - 40.0e0) / (50.0e0 - 40.0e0) * (0.053e0 - 0.049e0)
                     ELSE 0.053e0 END AS curve_y
              FROM lineitem""")),

    // JSON extraction over the events props column (beyond the reference,
    // which has no JSON — standard scalar surface for event streams).
    Q("x_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events""")),

    // X5 — code-map lookup (rating letter → numeric,
    // stage1/helper_functions.py:411-433): deterministic CASE ladder over
    // a derived code, plus the composite min-of-two-ratings shape.
    Q("x5_rating_map",
      (s, d) => {
        def rate(c: org.apache.spark.sql.Column) =
          when(c === "1-URGENT", 1).when(c === "2-HIGH", 2)
            .when(c === "3-MEDIUM", 3).when(c === "4-NOT SPECIFIED", 4)
            .when(c === "5-LOW", 5)
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            rate(col("o_orderpriority")).as("prio_num"),
            least(rate(col("o_orderpriority")),
              when(col("o_orderstatus") === "F", 2).otherwise(4)).as("composite"))
      },
      Some("""WITH m AS (
                SELECT o_orderkey,
                       CASE o_orderpriority WHEN '1-URGENT' THEN 1
                            WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
                            WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 END AS prio_num,
                       CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 4 END AS status_num
                FROM orders)
              SELECT o_orderkey, prio_num,
                     least(prio_num, status_num) AS composite
              FROM m""")),

    // Standard/144A recodes (stage0/create_daily_standard_trace.py:1735-1749):
    // text volume caps '5MM+'/'1MM+' replaced by their numeric values before
    // the to_numeric cast, and trc_st status unification G/M→T, H/N→C,
    // I/O→W. The volume text and raw status are deterministic derivations
    // from lineitem keys (quantity bands / l_partkey mod 9).
    Q("x_recode_volume_status",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""CASE WHEN l_quantity > 45 THEN '5MM+'
                       WHEN l_quantity > 40 THEN '1MM+'
                       ELSE CAST(CAST(l_quantity AS INT) * 1000 AS STRING) END""")
            .as("ascii_rptd_vol_tx"),
          expr("element_at(array('T','G','M','H','N','I','O','C','W'), CAST(1 + l_partkey % 9 AS INT))")
            .as("trc_st_raw"))
        .withColumn("entrd_vol_qt",
          expr("""CAST(CASE ascii_rptd_vol_tx WHEN '5MM+' THEN '5000000'
                       WHEN '1MM+' THEN '1000000'
                       ELSE ascii_rptd_vol_tx END AS DOUBLE)"""))
        .withColumn("trc_st",
          expr("""CASE WHEN trc_st_raw IN ('G','M') THEN 'T'
                       WHEN trc_st_raw IN ('H','N') THEN 'C'
                       WHEN trc_st_raw IN ('I','O') THEN 'W'
                       ELSE trc_st_raw END""")),
      Some("""WITH base AS (
                SELECT l_orderkey, l_linenumber,
                       CASE WHEN l_quantity > 45 THEN '5MM+'
                            WHEN l_quantity > 40 THEN '1MM+'
                            ELSE CAST(CAST(l_quantity AS INT) * 1000 AS VARCHAR) END
                         AS ascii_rptd_vol_tx,
                       (['T','G','M','H','N','I','O','C','W'])[CAST(1 + l_partkey % 9 AS INT)]
                         AS trc_st_raw
                FROM lineitem)
              SELECT l_orderkey, l_linenumber, ascii_rptd_vol_tx, trc_st_raw,
                     CAST(CASE ascii_rptd_vol_tx WHEN '5MM+' THEN '5000000'
                          WHEN '1MM+' THEN '1000000'
                          ELSE ascii_rptd_vol_tx END AS DOUBLE) AS entrd_vol_qt,
                     CASE WHEN trc_st_raw IN ('G','M') THEN 'T'
                          WHEN trc_st_raw IN ('H','N') THEN 'C'
                          WHEN trc_st_raw IN ('I','O') THEN 'W'
                          ELSE trc_st_raw END AS trc_st
              FROM base""")),

    // X6 (ext.) — the SQL FRONT DOOR: the same engine driven through
    // `spark.sql` over registered temp views, with a library-native
    // function (`log2milli`, registered by GraftExtensions) called BY
    // NAME inside the SQL text — proving a user who writes SQL (not
    // DataFrames) gets the full surface: views, joins, aggregation,
    // window ranking and the custom Catalyst expressions, in one
    // statement planned by the same Catalyst pipeline as everything
    // else. (Every other query here is DataFrame-API; this row pins the
    // second entry point.)
    Q("x6_sql_surface",
      (s, d) => {
        graft.GraftExtensions.ensure(s)
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""
          WITH per_cust AS (
            SELECT o_custkey, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                     AS BIGINT) AS cents
            FROM orders_v GROUP BY o_custkey),
          ranked AS (
            SELECT c.c_mktsegment, p.o_custkey, p.n_orders, p.cents,
                   row_number() OVER (PARTITION BY c.c_mktsegment
                     ORDER BY p.cents DESC, p.o_custkey) AS rk
            FROM per_cust p JOIN customer_v c ON p.o_custkey = c.c_custkey)
          SELECT c_mktsegment, rk, o_custkey, n_orders, cents,
                 log2milli(cents) AS cents_log2milli
          FROM ranked WHERE rk <= 5""")
      },
      Some {
        val l2m = graft.queries.QText.l2mSql
        s"""WITH per_cust AS (
              SELECT o_custkey, count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS BIGINT) AS cents
              FROM orders GROUP BY o_custkey),
            ranked AS (
              SELECT c.c_mktsegment, p.o_custkey, p.n_orders, p.cents,
                     row_number() OVER (PARTITION BY c.c_mktsegment
                       ORDER BY p.cents DESC, p.o_custkey) AS rk
              FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey)
            SELECT c_mktsegment, rk, o_custkey, n_orders, cents,
                   ${l2m("cents")} AS cents_log2milli
            FROM ranked WHERE rk <= 5"""
      }),

    // X7 (ext.) — RECURSIVE CTE (Spark 4's WITH RECURSIVE): iterative
    // traversal inside ONE SQL statement, the query-language surface
    // the engine's relational loops (CC, BPE rounds, PageRank) hand-
    // roll when recursion depth is data-dependent. Here the
    // world→region→nation→supplier hierarchy is walked from the root,
    // accumulating depth and the materialized path — the org-chart /
    // BOM-explosion shape. Each iteration is one join against the
    // (small) edge relation; depth bounds the loop. The same statement
    // text runs in DuckDB (both engines speak the standard syntax).
    Q("x7_recursive_cte",
      (s, d) => {
        Tables.region(s, d).createOrReplaceTempView("region_v")
        Tables.nation(s, d).createOrReplaceTempView("nation_v")
        Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
        s.sql("""
          WITH RECURSIVE edges AS (
            SELECT 'world' AS parent, r_name AS child FROM region_v
            UNION ALL
            SELECT r.r_name, n.n_name
            FROM nation_v n JOIN region_v r ON n.n_regionkey = r.r_regionkey
            UNION ALL
            SELECT n.n_name, concat('S', CAST(s_suppkey AS STRING))
            FROM supplier_v s JOIN nation_v n
              ON s.s_nationkey = n.n_nationkey),
          walk(node, depth, path) AS (
            SELECT 'world', 0, 'world'
            UNION ALL
            SELECT e.child, w.depth + 1, concat(w.path, '/', e.child)
            FROM walk w JOIN edges e ON e.parent = w.node
            WHERE w.depth < 3)
          SELECT node, depth, path FROM walk""")
      },
      Some("""WITH RECURSIVE edges AS (
                SELECT 'world' AS parent, r_name AS child FROM region
                UNION ALL
                SELECT r.r_name, n.n_name
                FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
                UNION ALL
                SELECT n.n_name, concat('S', CAST(s_suppkey AS VARCHAR))
                FROM supplier s JOIN nation n
                  ON s.s_nationkey = n.n_nationkey),
              walk(node, depth, path) AS (
                SELECT 'world', 0, 'world'
                UNION ALL
                SELECT e.child, w.depth + 1, concat(w.path, '/', e.child)
                FROM walk w JOIN edges e ON e.parent = w.node
                WHERE w.depth < 3)
              SELECT node, depth, path FROM walk""")),

    // X8 (ext.) — the VARIANT type (Spark 4's binary semi-structured
    // encoding): JSON ingested ONCE via parse_json into variant, then
    // typed path extraction with variant_get — the shredded-JSON path
    // that replaces per-access string re-parsing (get_json_object
    // re-tokenizes the text on every call; variant decodes a binary
    // tree). The JSON itself is derived in-query from events columns,
    // so the oracle reproduces the extracted values from the base
    // table and any extraction bug (type coercion, path miss)
    // hash-fails.
    Q("x8_variant",
      (s, d) => Tables.events(s, d)
        .select(to_json(struct(col("event_type"), col("value"),
          col("user_id"))).as("js"))
        .select(parse_json(col("js")).as("v"))
        .select(
          expr("variant_get(v, '$.event_type', 'string')").as("event_type"),
          expr("variant_get(v, '$.value', 'double')").as("val"),
          expr("variant_get(v, '$.user_id', 'long')").as("user_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Tables.dsum(col("val")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users")),
      Some("""SELECT event_type, count(*) AS n_events,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_value,
                     count(DISTINCT user_id) AS n_users
              FROM events
              GROUP BY 1""")),

    // X9 (ext.) — LATERAL correlated subquery: per-customer top-2
    // orders via a correlated ordered-LIMIT subquery — the SQL surface
    // for "for each row, run this parameterized query". Catalyst plans
    // the decorrelation into the same window-rank shape o3 writes by
    // hand; DuckDB runs the identical statement text natively.
    Q("x9_lateral",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_v9")
        Tables.orders(s, d).createOrReplaceTempView("orders_v9")
        s.sql("""
          SELECT c.c_custkey, c.c_mktsegment,
                 t.o_orderkey, t.o_totalprice
          FROM customer_v9 c,
          LATERAL (SELECT o_orderkey, o_totalprice
                   FROM orders_v9 o
                   WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                   LIMIT 2) t""")
      },
      Some("""SELECT c.c_custkey, c.c_mktsegment,
                     t.o_orderkey, t.o_totalprice
              FROM customer c,
              LATERAL (SELECT o_orderkey, o_totalprice
                       FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                       LIMIT 2) t""")),

    // X11 (ext.) — JOIN-STRATEGY HINTS: the same equi-join planned
    // three ways (BROADCAST / MERGE / SHUFFLE_HASH) — the lever a
    // 100 TB job pulls when Catalyst's size estimates are wrong (a dim
    // that looks big but is small post-filter, or the reverse). The
    // result is strategy-invariant (that is the oracle: each leg must
    // produce the identical aggregate); `JoinHintSpec` pins that each
    // hint actually selects its physical operator. The three legs are
    // unioned with a tag so one hash gate covers all of them.
    Q("x11_join_hints",
      (s, d) => {
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
        def leg(tag: String, hint: String) = orders
          .join(cust.hint(hint), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"))
          .withColumn("strategy", lit(tag))
        leg("broadcast", "broadcast")
          .unionByName(leg("merge", "merge"))
          .unionByName(leg("shuffle_hash", "shuffle_hash"))
      },
      Some("""WITH j AS (SELECT c.c_mktsegment, count(*) AS n_orders
                         FROM orders o
                         JOIN customer c ON o.o_custkey = c.c_custkey
                         GROUP BY 1)
              SELECT c_mktsegment, n_orders, s.strategy
              FROM j CROSS JOIN (VALUES ('broadcast'), ('merge'),
                                        ('shuffle_hash')) s(strategy)"""))
  )
}
