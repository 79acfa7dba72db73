package graft.queries

import graft.Tables
import graft.operators.GapsIslands
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ordered-sequence family (SURVEY.md §2.5) — the heart of the
  * reference. All operators are per-id, time-ordered under an explicit
  * total order (`ord` = event_id, the stand-in for the reference's
  * canonical sort key incl. msg_seq_nb — the #1 determinism trap: Spark
  * windows have no "stable mergesort", the key must be total).
  *
  * Scale notes: every query shuffles ONCE on the partition key; stacked
  * window specs share the same partitioning+ordering so Catalyst plans a
  * single sort+exchange. Rolling medians use collect-over-frame with
  * higher-order functions (frames are ≤11 rows — bounded state), never a
  * global sort.
  */
object QWindows extends Registry {

  private val w = "PARTITION BY id ORDER BY ord"

  def qs: Seq[Q] = Seq(

    // W1 — lagged price diff per id (stage0/create_daily_enhanced_trace
    // .py:1100). Decimal subtraction (exact) rendered as double.
    Q("w1_lag_diff",
      (s, d) => {
        val win = Window.partitionBy(col("id")).orderBy(col("ord"))
        Trades.df(s, d)
          .withColumn("price_diff",
            (col("price") - lag(col("price"), 1).over(win)).cast("double"))
          .select(col("id"), col("ord"), col("price_diff"))
      },
      Some(s"""WITH tr AS (${Trades.sql})
              SELECT id, ord,
                     CAST(price - lag(price, 1) OVER ($w) AS DOUBLE) AS price_diff
              FROM tr""")),

    // W2 — lead: next price relative change (stage0/create_daily_enhanced_
    // trace.py:1377-1395 computes the next log change; restated as a pure
    // ratio because libm transcendentals (ln) are not bit-identical across
    // engines — a division of identical operands is).
    Q("w2_lead_relchange",
      (s, d) => {
        val win = Window.partitionBy(col("id")).orderBy(col("ord"))
        Trades.df(s, d)
          // nullif guard: a 0.00 print would throw under ANSI mode in
          // Spark but silently NULL in DuckDB — make NULL explicit in both
          .withColumn("next_relchg",
            lead(col("price"), 1).over(win).cast("double") /
              expr("nullif(cast(price as double), 0.0d)") - 1.0)
          .select(col("id"), col("ord"), col("next_relchg"))
      },
      Some(s"""WITH tr AS (${Trades.sql})
              SELECT id, ord,
                     CAST(lead(price, 1) OVER ($w) AS DOUBLE)
                       / nullif(CAST(price AS DOUBLE), 0.0e0) - 1.0 AS next_relchg
              FROM tr""")),

    // W3 — per-group sequence numbers (SAS cumcount+1,
    // stage0/create_daily_standard_trace.py:109-118).
    Q("w3_row_number",
      (s, d) => {
        val win = Window.partitionBy(col("id"), col("dt")).orderBy(col("ord"))
        Trades.df(s, d)
          .withColumn("seq", row_number().over(win))
          .select(col("id"), col("ord"), col("seq"))
      },
      Some(s"""WITH tr AS (${Trades.sql})
              SELECT id, ord,
                     row_number() OVER (PARTITION BY id, dt ORDER BY ord) AS seq
              FROM tr""")),

    // W4 — centered/backward rolling medians with NA-fallback chain
    // (stage0/create_daily_enhanced_trace.py:858-909). Median over a ≤5-row
    // frame via sorted collect + manual middle pick — an actual element or
    // the mean of the two middles, all in double (identical both engines).
    Q("w4_rolling_median",
      (s, d) => {
        val centered =
          s"""sort_array(collect_list(cast(price as double)) over
              (partition by id order by ord rows between 2 preceding and 2 following))"""
        val backward =
          s"""sort_array(collect_list(cast(price as double)) over
              (partition by id order by ord rows between 2 preceding and current row))"""
        def medOf(arr: String) =
          s"""case when size($arr) % 2 = 1
                then element_at($arr, cast(size($arr) div 2 + 1 as int))
                else (element_at($arr, cast(size($arr) div 2 as int))
                      + element_at($arr, cast(size($arr) div 2 + 1 as int))) / 2 end"""
        Trades.df(s, d)
          .withColumn("med_c", expr(medOf(centered)))
          .withColumn("med_b", expr(medOf(backward)))
          .withColumn("anchor", coalesce(col("med_c"), col("med_b")))
          .select(col("id"), col("ord"), col("med_c"), col("med_b"), col("anchor"))
      },
      Some {
        def medOf(frame: String) =
          s"""(CASE WHEN len($frame) % 2 = 1
                THEN $frame[len($frame) // 2 + 1]
                ELSE ($frame[len($frame) // 2] + $frame[len($frame) // 2 + 1]) / 2 END)"""
        val c = s"list_sort(list(CAST(price AS DOUBLE)) OVER ($w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING))"
        val b = s"list_sort(list(CAST(price AS DOUBLE)) OVER ($w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))"
        s"""WITH tr AS (${Trades.sql}),
            f AS (SELECT id, ord, $c AS fc, $b AS fb FROM tr)
            SELECT id, ord, ${medOf("fc")} AS med_c, ${medOf("fb")} AS med_b,
                   coalesce(${medOf("fc")}, ${medOf("fb")}) AS anchor
            FROM f"""
      }),

    // W5 — trailing *unique* median with shift(1) anchor
    // (stage0/create_daily_enhanced_trace.py:1084-1095): median over the
    // DISTINCT values of the previous 3 rows — strictly backward-looking.
    Q("w5_trailing_unique_median",
      (s, d) => {
        val arr =
          s"""sort_array(array_distinct(collect_list(cast(price as double)) over
              (partition by id order by ord rows between 3 preceding and 1 preceding)))"""
        Trades.df(s, d)
          .withColumn("uniq_med", expr(
            s"""case when size($arr) = 0 then null
                when size($arr) % 2 = 1 then element_at($arr, cast(size($arr) div 2 + 1 as int))
                else (element_at($arr, cast(size($arr) div 2 as int))
                      + element_at($arr, cast(size($arr) div 2 + 1 as int))) / 2 end"""))
          .select(col("id"), col("ord"), col("uniq_med"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              f AS (SELECT id, ord,
                      list_sort(list_distinct(list(CAST(price AS DOUBLE)) OVER
                        ($w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))) AS a
                    FROM tr)
              SELECT id, ord,
                CASE WHEN a IS NULL OR len(a) = 0 THEN NULL
                     WHEN len(a) % 2 = 1 THEN a[len(a) // 2 + 1]
                     ELSE (a[len(a) // 2] + a[len(a) // 2 + 1]) / 2 END AS uniq_med
              FROM f""")),

    // W6 — cumulative count and cumulative sum
    // (stage1/helper_functions.py:2307). Decimal cumsum — exact.
    Q("w6_cumsum",
      (s, d) => {
        val win = Window.partitionBy(col("id")).orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, 0)
        Trades.df(s, d)
          .withColumn("cum_n", count(lit(1)).over(win))
          .withColumn("cum_dvol",
            sum(col("dvol")).over(win).cast("double"))
          .select(col("id"), col("ord"), col("cum_n"), col("cum_dvol"))
      },
      Some(s"""WITH tr AS (${Trades.sql})
              SELECT id, ord,
                count(*) OVER ($w ROWS UNBOUNDED PRECEDING) AS cum_n,
                CAST(sum(dvol) OVER ($w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_dvol
              FROM tr""")),

    // W9 — initial-price-error filter (stage0/create_daily_enhanced_trace
    // .py:1223-1320): within the first 3 rows per id, the first |Δprice|>50
    // jump flags every row before it. Pure windows — no UDF.
    Q("w9_initial_error",
      (s, d) => {
        val win = Window.partitionBy(col("id")).orderBy(col("ord"))
        val wAll = Window.partitionBy(col("id"))
        Trades.df(s, d)
          .withColumn("rn", row_number().over(win))
          .withColumn("jump",
            abs(col("price") - lag(col("price"), 1).over(win)).cast("double") > 50
              && col("rn") <= 3)
          .withColumn("first_jump_rn",
            min(when(col("jump"), col("rn"))).over(wAll))
          .withColumn("initial_error",
            when(col("rn") < coalesce(col("first_jump_rn"), lit(0)), 1)
              .otherwise(0))
          .select(col("id"), col("ord"), col("initial_error"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              a AS (SELECT id, ord, price,
                      row_number() OVER ($w) AS rn,
                      CAST(abs(price - lag(price, 1) OVER ($w)) AS DOUBLE) AS adiff
                    FROM tr),
              b AS (SELECT id, ord, rn,
                      min(CASE WHEN adiff > 50 AND rn <= 3 THEN rn END)
                        OVER (PARTITION BY id) AS fj
                    FROM a)
              SELECT id, ord,
                     CASE WHEN rn < coalesce(fj, 0) THEN 1 ELSE 0 END AS initial_error
              FROM b""")),

    // W10/W11 — anomaly detector: median of STRICTLY HIGHER prices within
    // ±5 rows; flag when that median ≥ 3× the price (ultra-distressed
    // detector, stage1/helper_functions.py:766-910). The reference uses
    // numba row loops; here it is a collect-frame + higher-order lambda —
    // whole-stage-codegen-friendly, no UDF.
    Q("w10_anomaly_median_ratio",
      (s, d) => {
        val arr =
          s"""sort_array(filter(collect_list(cast(price as double)) over
              (partition by id order by ord rows between 5 preceding and 5 following),
              x -> x > cast(price as double)))"""
        Trades.df(s, d)
          .withColumn("hi_med", expr(
            s"""case when size($arr) = 0 then null
                when size($arr) % 2 = 1 then element_at($arr, cast(size($arr) div 2 + 1 as int))
                else (element_at($arr, cast(size($arr) div 2 as int))
                      + element_at($arr, cast(size($arr) div 2 + 1 as int))) / 2 end"""))
          .withColumn("anomaly",
            // nullif: zero prints NULL the ratio (DuckDB's native /0
            // result) instead of throwing under ANSI; NULL ≥ 3 is false
            when(col("hi_med") / expr("nullif(cast(price as double), 0.0d)") >= 3, 1)
              .otherwise(0))
          .select(col("id"), col("ord"), col("hi_med"), col("anomaly"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              f AS (SELECT id, ord, price,
                      list_sort(list_filter(list(CAST(price AS DOUBLE)) OVER
                        ($w ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING),
                        x -> x > CAST(price AS DOUBLE))) AS a
                    FROM tr),
              m AS (SELECT id, ord, price,
                      CASE WHEN a IS NULL OR len(a) = 0 THEN NULL
                           WHEN len(a) % 2 = 1 THEN a[len(a) // 2 + 1]
                           ELSE (a[len(a) // 2] + a[len(a) // 2 + 1]) / 2 END AS hi_med
                    FROM f)
              SELECT id, ord, hi_med,
                     CASE WHEN hi_med / nullif(CAST(price AS DOUBLE), 0.0e0) >= 3
                          THEN 1 ELSE 0 END AS anomaly
              FROM m""")),

    // W11 — upward-spike detector (stage1/helper_functions.py:836-910):
    // price ≥ 3× the median of strictly-lower prices in the 5-row
    // lookback, AND a recovery to ≤ 2× that median occurs within the
    // 5-row lookahead. Collect-frame + lambdas — the reference's numba
    // loop as pure expressions.
    Q("w11_spike_recovery",
      (s, d) => {
        val lo =
          s"""sort_array(filter(collect_list(cast(price as double)) over
              (partition by id order by ord rows between 5 preceding and 1 preceding),
              x -> x < cast(price as double)))"""
        val ahead =
          s"""collect_list(cast(price as double)) over
              (partition by id order by ord rows between 1 following and 5 following)"""
        Trades.df(s, d)
          .withColumn("lo_med", expr(
            s"""case when size($lo) = 0 then null
                when size($lo) % 2 = 1 then element_at($lo, cast(size($lo) div 2 + 1 as int))
                else (element_at($lo, cast(size($lo) div 2 as int))
                      + element_at($lo, cast(size($lo) div 2 + 1 as int))) / 2 end"""))
          .withColumn("recovers", expr(
            s"exists($ahead, x -> x <= 2 * lo_med)"))
          .withColumn("spike_flag",
            // nullif on lo_med: a lookback of zero prints gives median 0 —
            // NULL ratio (DuckDB semantics), not an ANSI throw
            when(col("lo_med").isNotNull &&
              col("price").cast("double") / expr("nullif(lo_med, 0.0d)") >= 3 &&
              col("recovers"), 1).otherwise(0))
          .select(col("id"), col("ord"), col("lo_med"), col("spike_flag"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              f AS (SELECT id, ord, price,
                      list_sort(list_filter(list(CAST(price AS DOUBLE)) OVER
                        ($w ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
                        x -> x < CAST(price AS DOUBLE))) AS lo,
                      list(CAST(price AS DOUBLE)) OVER
                        ($w ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING) AS ahead
                    FROM tr),
              m AS (SELECT id, ord, price, ahead,
                      CASE WHEN lo IS NULL OR len(lo) = 0 THEN NULL
                           WHEN len(lo) % 2 = 1 THEN lo[len(lo) // 2 + 1]
                           ELSE (lo[len(lo) // 2] + lo[len(lo) // 2 + 1]) / 2 END AS lo_med
                    FROM f)
              SELECT id, ord, lo_med,
                     CASE WHEN lo_med IS NOT NULL
                            AND CAST(price AS DOUBLE) / nullif(lo_med, 0.0e0) >= 3
                            AND len(list_filter(coalesce(ahead, []), x -> x <= 2 * lo_med)) > 0
                          THEN 1 ELSE 0 END AS spike_flag
              FROM m""")),

    // W12 — plateau detector: runs of equal WHOLE-DOLLAR price levels
    // (gaps-and-islands), suspicious when run length ≥ 2
    // (stage1/helper_functions.py:913-979 — the reference flags "round
    // plateau" prices; floor() avoids the engines' round-half edge on
    // exact .50 decimals and makes the sf0.01 row discriminating: 81
    // qualifying runs vs 0 under exact-price equality, which left the
    // oracle row vacuously green).
    Q("w12_plateau_islands",
      (s, d) => {
        val islands = GapsIslands.islandId(
          Trades.df(s, d).withColumn("price_lvl", floor(col("price"))),
          partition = Seq("id"),
          order = Seq(col("ord").asc),
          valueCol = "price_lvl",
          islandCol = "island")
        islands
          .groupBy(col("id"), col("island"))
          .agg(count(lit(1)).as("run_len"),
            min(col("ord")).as("run_start"),
            max(col("price_lvl")).cast("double").as("price_lvl"))
          .filter(col("run_len") >= 2)
          .select(col("id"), col("run_start"), col("run_len"), col("price_lvl"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              a AS (SELECT id, ord, floor(price) AS price_lvl,
                      CASE WHEN lag(floor(price), 1) OVER ($w) IS NULL
                             OR lag(floor(price), 1) OVER ($w) <> floor(price)
                           THEN 1 ELSE 0 END AS chg
                    FROM tr),
              b AS (SELECT id, ord, price_lvl,
                      sum(chg) OVER ($w ROWS UNBOUNDED PRECEDING) AS island
                    FROM a),
              c AS (SELECT id, island, count(*) AS run_len,
                      min(ord) AS run_start,
                      CAST(max(price_lvl) AS DOUBLE) AS price_lvl
                    FROM b GROUP BY id, island)
              SELECT id, run_start, run_len, price_lvl FROM c WHERE run_len >= 2""")),

    // W14 — first-change flag: the 2nd observation per id is flagged when
    // |Δprice| > 35 inside a fixed month (prc_dip,
    // stage1/stage1_pipeline.py:1766-1799).
    Q("w14_first_change_flag",
      (s, d) => {
        val jan = Trades.df(s, d)
          .filter(col("dt") >= lit("2024-01-01") && col("dt") < lit("2024-02-01"))
        val win = Window.partitionBy(col("id")).orderBy(col("ord"))
        jan
          .withColumn("rn", row_number().over(win))
          .withColumn("adiff",
            abs(col("price") - lag(col("price"), 1).over(win)).cast("double"))
          .withColumn("prc_dip",
            when(col("rn") === 2 && col("adiff") > 35, 1).otherwise(0))
          .select(col("id"), col("ord"), col("prc_dip"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              jan AS (SELECT * FROM tr
                      WHERE dt >= DATE '2024-01-01' AND dt < DATE '2024-02-01'),
              a AS (SELECT id, ord,
                      row_number() OVER ($w) AS rn,
                      CAST(abs(price - lag(price, 1) OVER ($w)) AS DOUBLE) AS adiff
                    FROM jan)
              SELECT id, ord,
                     CASE WHEN rn = 2 AND adiff > 35 THEN 1 ELSE 0 END AS prc_dip
              FROM a""")),

    // W15 — resample-to-daily + forward-fill (treasury curve shape,
    // stage1/helper_functions.py:750-754): per-id daily grid via
    // sequence+explode, then last(value, ignoreNulls) over the grid.
    Q("w15_resample_ffill",
      (s, d) => {
        val daily = Trades.df(s, d)
          .groupBy(col("id"), col("dt"))
          .agg(max_by(col("price"), col("ord")).cast("double").as("last_price"))
        val grid = daily.groupBy(col("id"))
          .agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
          .select(col("id"),
            explode(sequence(col("d0"), col("d1"),
              expr("interval 1 day"))).as("dt"))
        val win = Window.partitionBy(col("id")).orderBy(col("dt"))
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.join(daily, Seq("id", "dt"), "left")
          .withColumn("price_ffill",
            last(col("last_price"), ignoreNulls = true).over(win))
          .select(col("id"), col("dt"), col("price_ffill"))
      },
      Some(s"""WITH tr AS (${Trades.sql}),
              daily AS (SELECT id, dt,
                          CAST(arg_max(price, ord) AS DOUBLE) AS last_price
                        FROM tr GROUP BY id, dt),
              grid AS (SELECT id, CAST(unnest(generate_series(min(dt), max(dt),
                         INTERVAL 1 DAY)) AS DATE) AS dt
                       FROM daily GROUP BY id)
              SELECT g.id, g.dt,
                     last_value(d.last_price IGNORE NULLS) OVER
                       (PARTITION BY g.id ORDER BY g.dt) AS price_ffill
              FROM grid g LEFT JOIN daily d ON g.id = d.id AND g.dt = d.dt""")),

    // W13 — intraday inconsistency: flag panel rows where some price column
    // is < 20, >=2 price columns are present, and the spread across them
    // exceeds 75% of their mean (stage1/helper_functions.py:1231-1273,
    // flag_intraday_inconsistency_vectorized). Pure greatest/least
    // expressions over the daily panel — null columns neutralized with
    // +/-1e308 sentinels so both engines agree regardless of their
    // greatest()-vs-NULL semantics; all arithmetic is plain IEEE.
    Q("w13_intraday_inconsistency",
      (s, d) => graft.agg.DailyMetrics.panel(Trades.df(s, d))
        .select(col("id"), col("dt"), col("prc_ew"), col("prc_vw"),
          col("prc_first"), col("prc_last"))
        .withColumn("flag_intraday", expr(QWindows.w13FlagSql)),
      Some(s"""WITH tr AS (${Trades.sql}),
              panel AS (SELECT id, dt,
                CAST(sum(CAST(price AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS prc_ew,
                CAST(sum(CAST(price * dvol AS DECIMAL(38,6))) AS DOUBLE)
                      / nullif(CAST(sum(CAST(dvol AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS prc_vw,
                CAST(arg_min(price, ord) AS DOUBLE) AS prc_first,
                CAST(arg_max(price, ord) AS DOUBLE) AS prc_last
                FROM tr GROUP BY id, dt)
              SELECT id, dt, prc_ew, prc_vw, prc_first, prc_last,
                     ${QWindows.w13FlagSql} AS flag_intraday
              FROM panel""")),

    // W17 (ext.) — ordered-subsequence funnel over the events stream
    // (the CEP-flavored cousin of J7's sequence match): how many users
    // reach view → click → purchase IN ORDER, any gaps allowed. ONE
    // groupBy(user) pass: events fold to a per-user code string in
    // (ts, event_id) order inside the row (sort_array over a collected
    // struct — no window, no second shuffle), and subsequence reach is
    // a wildcard regex on that string, identical text in both engines.
    // Scale note: per-user event counts are bounded (sessions, not the
    // fact table) — the collect_list is the per-key payload a
    // sessionizer holds anyway; the output is one row.
    Q("w17_event_funnel",
      (s, d) => {
        val code = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p").otherwise("x")
        Tables.events(s, d)
          .select(col("user_id"), struct(col("ts"), col("event_id"),
            code.as("code")).as("e"))
          .groupBy(col("user_id"))
          .agg(concat_ws("",
            expr("transform(sort_array(collect_list(e)), s -> s.code)"))
            .as("seq"))
          .agg(count(lit(1)).as("n_users"),
            count(when(col("seq").rlike("v"), 1)).as("n_view"),
            count(when(col("seq").rlike("v.*c"), 1)).as("n_view_click"),
            count(when(col("seq").rlike("v.*c.*p"), 1)).as("n_full_funnel"))
      },
      Some("""WITH seqs AS (
                SELECT user_id,
                       string_agg(CASE event_type WHEN 'view' THEN 'v'
                                    WHEN 'click' THEN 'c'
                                    WHEN 'purchase' THEN 'p'
                                    ELSE 'x' END, ''
                                  ORDER BY ts, event_id) AS seq
                FROM events GROUP BY 1)
              SELECT count(*) AS n_users,
                     count(*) FILTER (WHERE regexp_matches(seq, 'v'))
                       AS n_view,
                     count(*) FILTER (WHERE regexp_matches(seq, 'v.*c'))
                       AS n_view_click,
                     count(*) FILTER (WHERE regexp_matches(seq, 'v.*c.*p'))
                       AS n_full_funnel
              FROM seqs"""))
  ,

    // W18 (ext.) — rolling OLS slope ("trailing beta"): the regression
    // coefficient of price-cents on the day index over the trailing 10
    // rows per supplier — the rolling-estimate shape every factor
    // pipeline computes (the reference does its regressions in pandas
    // post-export; here it is ONE window pass). All five sufficient
    // statistics (n, Σx, Σy, Σxy, Σx²) are INTEGER window sums over the
    // same (supplier, order) frame — one shuffle, one sort, five
    // codegen'd running sums — and the slope ships in exact milli-units
    // via truncating integer division (both engines share it), so the
    // hash compare is bit-exact with no IEEE accumulation-order risk.
    // Windows shorter than 2 distinct x values yield NULL (den = 0).
    Q("w18_rolling_beta",
      (s, d) => {
        val win = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("ship_d"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(-9, 0)
        Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_d"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100)
              .cast("bigint").as("y"))
          .withColumn("x",
            datediff(col("ship_d"), lit("1995-01-01")).cast("bigint"))
          .withColumn("n", count(lit(1)).over(win))
          .withColumn("sx", sum(col("x")).over(win))
          .withColumn("sy", sum(col("y")).over(win))
          .withColumn("sxy", sum(col("x") * col("y")).over(win))
          .withColumn("sxx", sum(col("x") * col("x")).over(win))
          .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            when(col("den") =!= 0L,
              expr("((n * sxy - sx * sy) * 1000) div den"))
              .as("slope_milli"))
      },
      Some("""WITH base AS (
                SELECT l_suppkey, l_orderkey, l_linenumber,
                       CAST(l_shipdate AS DATE) AS ship_d,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS y,
                       CAST(datediff('day', DATE '1995-01-01',
                         CAST(l_shipdate AS DATE)) AS BIGINT) AS x
                FROM lineitem),
              stats AS (
                SELECT l_suppkey, l_orderkey, l_linenumber,
                       count(*) OVER w AS n,
                       sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                       sum(x * y) OVER w AS sxy,
                       sum(x * x) OVER w AS sxx
                FROM base
                WINDOW w AS (PARTITION BY l_suppkey
                             ORDER BY ship_d, l_orderkey, l_linenumber
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
              SELECT l_suppkey, l_orderkey, l_linenumber,
                     CAST(CASE WHEN n * sxx - sx * sx <> 0
                          THEN ((n * sxy - sx * sy) * 1000)
                               // (n * sxx - sx * sx)
                          END AS BIGINT) AS slope_milli
              FROM stats""")),

    // W19 (ext.) — MATCH_RECOGNIZE-style pattern extraction: not just
    // "did the funnel complete" (w17) but WHICH events completed it —
    // per user, the FIRST view, the first click AFTER that view, the
    // first purchase AFTER that click, with event ids and the exact
    // microsecond span. One groupBy pass builds the time-ordered code
    // string + parallel id/timestamp arrays in-row; the pattern walk is
    // three codegen'd instr() probes with positional indexing back into
    // the arrays — no window, no self-join, no second shuffle. The CEP
    // shape (SQL MATCH_RECOGNIZE / Flink CEP) on engine-native
    // primitives; per-user payload is session-scale.
    Q("w19_match_recognize",
      (s, d) => {
        val code = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p").otherwise("x")
        Tables.events(s, d)
          .select(col("user_id"), struct(col("ts"), col("event_id"),
            code.as("code")).as("e"))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(col("e"))).as("arr"))
          .select(col("user_id"),
            concat_ws("", expr("transform(arr, s -> s.code)")).as("seq"),
            expr("transform(arr, s -> s.event_id)").as("ids"),
            expr("transform(arr, s -> unix_micros(s.ts))").as("tss"))
          .withColumn("iv", expr("instr(seq, 'v')"))
          .withColumn("rc",
            expr("CASE WHEN iv > 0 THEN instr(substring(seq, iv + 1), 'c') ELSE 0 END"))
          .withColumn("ic", expr("CASE WHEN rc > 0 THEN iv + rc END"))
          .withColumn("rp",
            expr("CASE WHEN ic IS NOT NULL THEN instr(substring(seq, ic + 1), 'p') ELSE 0 END"))
          .withColumn("ip", expr("CASE WHEN rp > 0 THEN ic + rp END"))
          .filter(col("ip").isNotNull)
          .select(col("user_id"),
            expr("element_at(ids, iv)").as("view_event"),
            expr("element_at(ids, ic)").as("click_event"),
            expr("element_at(ids, ip)").as("purchase_event"),
            (expr("element_at(tss, ip)") - expr("element_at(tss, iv)"))
              .as("span_micros"))
      },
      Some("""WITH e AS (
                SELECT user_id, ts, event_id,
                       CASE event_type WHEN 'view' THEN 'v'
                         WHEN 'click' THEN 'c'
                         WHEN 'purchase' THEN 'p' ELSE 'x' END AS code
                FROM events),
              g AS (SELECT user_id,
                      string_agg(code, '' ORDER BY ts, event_id) AS seq,
                      list(event_id ORDER BY ts, event_id) AS ids,
                      list(epoch_us(CAST(ts AS TIMESTAMP))
                           ORDER BY ts, event_id) AS tss
                    FROM e GROUP BY 1),
              m1 AS (SELECT *, strpos(seq, 'v') AS iv FROM g),
              m2 AS (SELECT *,
                       CASE WHEN iv > 0
                              AND strpos(substr(seq, iv + 1), 'c') > 0
                            THEN iv + strpos(substr(seq, iv + 1), 'c')
                            END AS ic
                     FROM m1),
              m3 AS (SELECT *,
                       CASE WHEN ic IS NOT NULL
                              AND strpos(substr(seq, ic + 1), 'p') > 0
                            THEN ic + strpos(substr(seq, ic + 1), 'p')
                            END AS ip
                     FROM m2)
              SELECT user_id,
                     ids[iv] AS view_event,
                     ids[ic] AS click_event,
                     ids[ip] AS purchase_event,
                     tss[ip] - tss[iv] AS span_micros
              FROM m3 WHERE ip IS NOT NULL"""))
  ,

    // W20 (ext.) — BATCH gap-sessionization via the built-in
    // session_window aggregation (the engine-native operator behind
    // streaming session windows, here on a batch frame): one groupBy
    // (user, session_window(ts, 1h)) pass — merge-able partial session
    // state, no window function, no gaps-and-islands SQL. The oracle IS
    // the gaps-and-islands formulation (same 3600s gap as
    // stream_sessionize), so the two independent constructions of
    // "session" must agree row for row; unlike the streaming path there
    // is no tail-emission caveat — batch emits every session.
    Q("w20_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "1 hour").as("sw"))
        .agg(count(lit(1)).cast("int").as("n_events"),
          max(col("ts")).as("session_end"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("session_end"), col("n_events")),
      Some("""WITH e AS (
                SELECT user_id, ts,
                       epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
                FROM events),
              g AS (SELECT user_id, ts, tms,
                      CASE WHEN lag(tms) OVER w IS NULL
                             OR tms - lag(tms) OVER w > 3600000
                           THEN 1 ELSE 0 END AS brk
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
              si AS (SELECT user_id, ts, tms,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY tms
                                      ROWS UNBOUNDED PRECEDING) AS sid
                     FROM g)
              SELECT user_id, min(ts) AS session_start,
                     max(ts) AS session_end,
                     CAST(count(*) AS INT) AS n_events
              FROM si GROUP BY user_id, sid""")),

    // W21 (ext.) — cumulative DISTINCT count: running number of unique
    // customers ever seen, by order date (the "cumulative users" curve
    // every growth dashboard draws). COUNT(DISTINCT) isn't a window
    // function in either engine, so both use the same two-step
    // construction: first-appearance flag per customer (row_number = 1),
    // daily rollup, then a running sum over dates. The running sum runs
    // through `operators.PrefixSum` — date cardinality is bounded
    // (~2.4k rows here) but the operator costs nothing extra and never
    // single-partitions, so the same query text survives a per-minute
    // or per-key grain where the windowed relation DOES scale.
    Q("w21_cume_distinct",
      (s, d) => {
        val first = Tables.orders(s, d)
          .select(col("o_custkey"),
            col("o_orderdate").cast("date").as("dt"), col("o_orderkey"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("dt"), col("o_orderkey"))))
        val daily = first.groupBy(col("dt"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("rn") === 1, 1L).otherwise(0L))
              .as("new_customers"))
        graft.operators.PrefixSum.withRunningSumAndRank(
            daily, Seq(col("dt")), col("new_customers"),
            "cum_customers", "__rk", persistInput = false)
          .select(col("dt"), col("n_orders"), col("new_customers"),
            col("cum_customers"))
      },
      Some("""WITH f AS (
                SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
                         AS rn
                FROM orders),
              daily AS (
                SELECT dt, count(*) AS n_orders,
                       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS new_customers
                FROM f GROUP BY 1)
              SELECT dt, n_orders, new_customers,
                     CAST(sum(new_customers) OVER (ORDER BY dt
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_customers
              FROM daily""")),

    // W22 (ext.) — RANGE-framed rolling window: per-supplier trailing
    // 30-day dollar volume at every shipment. The frame is a VALUE range
    // (all peers within 29 days), not a row count — the semantics w18's
    // ROWS frame can't express when a supplier ships several lines the
    // same day or skips days. Integer day ordinal + cent-exact BIGINT
    // volumes keep both engines bit-identical; one (supplier) shuffle,
    // one sort, zero joins.
    Q("w22_range_window",
      (s, d) => {
        val base = Tables.lineitem(s, d).select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate").cast("date"), lit("1995-01-01"))
            .cast("long").as("ship_day"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        base.withColumn("dvol30_cents",
          sum(col("cents")).over(
            Window.partitionBy(col("l_suppkey")).orderBy(col("ship_day"))
              .rangeBetween(-29, 0)))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                     CAST(datediff('day', DATE '1995-01-01',
                       CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents,
                     CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * 100 AS BIGINT)) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY CAST(datediff('day', DATE '1995-01-01',
                         CAST(l_shipdate AS DATE)) AS BIGINT)
                       RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS dvol30_cents
              FROM lineitem""")),

    // W23 (ext.) — the normalized-rank family: percent_rank, cume_dist,
    // ntile(4) per supplier over a TOTAL order (ties broken by key, so
    // ntile's row-order-dependent bucketing is deterministic). The
    // ranks are exact rationals ((r-1)/(n-1), cr/n) that both engines
    // compute identically in double; one keyed shuffle + sort serves
    // all three functions.
    Q("w23_rank_family",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"),
            col("l_linenumber"))
        Tables.lineitem(s, d).select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                     percent_rank() OVER w AS pct_rank,
                     cume_dist() OVER w AS cume,
                     ntile(4) OVER w AS quartile
              FROM lineitem
              WINDOW w AS (PARTITION BY l_suppkey
                           ORDER BY l_extendedprice, l_orderkey,
                                    l_linenumber)""")),

    // W24 (ext.) — running peak & DRAWDOWN: per supplier along the
    // line order, the running maximum price and the distance under
    // it — the max-drawdown primitive of every risk report. Running max
    // is an ordinary cumulative frame (one keyed shuffle+sort); cents
    // keep it integer-exact.
    Q("w24_drawdown",
      (s, d) => {
        Tables.lineitem(s, d).select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100)
              .cast("long").as("cents"))
          .withColumn("peak_cents",
            max(col("cents")).over(
              Window.partitionBy(col("l_suppkey"))
                // cents tiebreak: (orderkey, linenumber) is not unique
                // within a supplier; ties must be value-identical in
                // every used column for cross-engine determinism
                .orderBy(col("l_orderkey"), col("l_linenumber"),
                  col("cents"))
                .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("drawdown_cents", col("peak_cents") - col("cents"))
      },
      Some("""WITH b AS (
                SELECT l_suppkey, l_orderkey, l_linenumber,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                FROM lineitem)
              SELECT l_suppkey, l_orderkey, l_linenumber, cents,
                     CAST(max(cents) OVER (PARTITION BY l_suppkey
                       ORDER BY l_orderkey, l_linenumber, cents
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_cents,
                     CAST(max(cents) OVER (PARTITION BY l_suppkey
                       ORDER BY l_orderkey, l_linenumber, cents
                       ROWS UNBOUNDED PRECEDING) - cents AS BIGINT)
                       AS drawdown_cents
              FROM b""")),

    // W25 (ext.) — EWMA as an EXACT trailing window: the pandas `ewm`
    // smoother, truncated to the last 8 observations with geometric
    // weights 2^7..2^0 (newest heaviest — within 0.4% of the infinite
    // α=1/2 EWMA) so the whole thing is INTEGER arithmetic: numerator =
    // Σ lag_j·2^(7−j), denominator = Σ of the weights actually present
    // (partial heads divide by their own mass, pandas' adjust=True).
    // Eight lag() terms over ONE shared frame — codegen'd, one keyed
    // shuffle, and bit-identical cross-engine where a recursive float
    // EWMA never could be.
    Q("w25_ewma_window",
      (s, d) => {
        // (l_orderkey, l_linenumber) is NOT unique within a supplier in
        // the synthetic lineitem (165 collisions at sf0.01) — cents as
        // the final tiebreak makes tied rows identical in every USED
        // column, so the lag chains are deterministic cross-engine
        val part =
          "PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, cents"
        val num = (0 to 7).map(j =>
          s"coalesce(lag(cents, $j) OVER ($part) * ${1L << (7 - j)}, 0)")
          .mkString(" + ")
        val den = (0 to 7).map(j =>
          s"(CASE WHEN lag(cents, $j) OVER ($part) IS NOT NULL " +
            s"THEN ${1L << (7 - j)} ELSE 0 END)").mkString(" + ")
        Tables.lineitem(s, d).select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100)
              .cast("long").as("cents"))
          // identical expression TEXT to the oracle (Spark's `div` ==
          // DuckDB's `//` on BIGINT) — the weighted-lag formulation is
          // shared, not restated
          .withColumn("ewma_milli",
            expr(s"($num) * 1000 div ($den)"))
      },
      Some {
        // (l_orderkey, l_linenumber) is NOT unique within a supplier in
        // the synthetic lineitem (165 collisions at sf0.01) — cents as
        // the final tiebreak makes tied rows identical in every USED
        // column, so the lag chains are deterministic cross-engine
        val part =
          "PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, cents"
        val num = (0 to 7).map(j =>
          s"coalesce(lag(cents, $j) OVER ($part) * ${1L << (7 - j)}, 0)")
          .mkString(" + ")
        val den = (0 to 7).map(j =>
          s"(CASE WHEN lag(cents, $j) OVER ($part) IS NOT NULL " +
            s"THEN ${1L << (7 - j)} ELSE 0 END)").mkString(" + ")
        s"""WITH b AS (
              SELECT l_suppkey, l_orderkey, l_linenumber,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents
              FROM lineitem)
            SELECT l_suppkey, l_orderkey, l_linenumber, cents,
                   CAST(($num) * 1000 // ($den) AS BIGINT) AS ewma_milli
            FROM b"""
      }),

    // W26 (ext.) — grouped AUTOCORRELATION (lags 1–3) of each
    // supplier's observed daily-revenue series: the seasonality /
    // mean-reversion diagnostic every factor pipeline computes, built
    // exactly like w18's OLS — integer sufficient statistics, here over
    // (x_t, x_{t−h}) pairs. ONE window pass materializes all three lags
    // (a single `stack` projection fans them out — no per-lag re-read),
    // one hash-agg collects (n, Σx, Σxh, Σx², Σxh², Σx·xh) per
    // (supplier, lag), and the Pearson pieces ship as exact BIGINTs
    // (num, denx, deny) with r in milli via the shared IEEE
    // floor(1000·num/√(dx·dy)). Units are kilo-cents (truncating div
    // both engines share) so every squared sum stays deep inside Long
    // at any SF. Scale shape: series rows are (supplier × active-day)
    // group cardinality, the window sorts within supplier only, and the
    // pair relation is 3× the series — never the fact table.
    Q("w26_acf",
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .select(col("l_suppkey"), to_date(col("l_shipdate")).as("ship_d"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100)
              .cast("bigint").as("cents"))
          .groupBy(col("l_suppkey"), col("ship_d"))
          .agg(sum(col("cents")).as("day_cents"))
          .withColumn("x", expr("day_cents div 1000"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_suppkey")).orderBy(col("ship_d"))
        val pairs = daily
          .withColumn("x1", lag(col("x"), 1).over(w))
          .withColumn("x2", lag(col("x"), 2).over(w))
          .withColumn("x3", lag(col("x"), 3).over(w))
          .select(col("l_suppkey"), col("x"),
            expr("stack(3, 1, x1, 2, x2, 3, x3) AS (lag_h, xh)"))
          .filter(col("xh").isNotNull)
        pairs.groupBy(col("l_suppkey"), col("lag_h"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("xh")).as("sxh"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("xh") * col("xh")).as("sxhxh"),
            sum(col("x") * col("xh")).as("sxy"))
          .select(col("l_suppkey"), col("lag_h"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sxh")).as("acf_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("acf_denx"),
            (col("n") * col("sxhxh") - col("sxh") * col("sxh"))
              .as("acf_deny"))
          .withColumn("r_milli",
            when(col("acf_denx") > 0 && col("acf_deny") > 0,
              floor(lit(1000.0) * col("acf_num") /
                sqrt(col("acf_denx").cast("double")
                  * col("acf_deny").cast("double"))).cast("bigint")))
      },
      Some("""WITH daily AS (
                SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_d,
                       sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * 100 AS BIGINT)) AS day_cents
                FROM lineitem GROUP BY 1, 2),
              x AS (SELECT l_suppkey, ship_d,
                      CAST(day_cents // 1000 AS BIGINT) AS x FROM daily),
              lagged AS (
                SELECT l_suppkey, x,
                       lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
                       lag(x, 3) OVER w AS x3
                FROM x
                WINDOW w AS (PARTITION BY l_suppkey ORDER BY ship_d)),
              pairs AS (
                SELECT l_suppkey, 1 AS lag_h, x, x1 AS xh FROM lagged
                WHERE x1 IS NOT NULL
                UNION ALL
                SELECT l_suppkey, 2, x, x2 FROM lagged WHERE x2 IS NOT NULL
                UNION ALL
                SELECT l_suppkey, 3, x, x3 FROM lagged WHERE x3 IS NOT NULL),
              agg AS (
                SELECT l_suppkey, lag_h, count(*) AS n,
                       sum(x) AS sx, sum(xh) AS sxh, sum(x*x) AS sxx,
                       sum(xh*xh) AS sxhxh, sum(x*xh) AS sxy
                FROM pairs GROUP BY 1, 2)
              SELECT l_suppkey, lag_h, CAST(n AS BIGINT) AS n,
                     CAST(n*sxy - sx*sxh AS BIGINT) AS acf_num,
                     CAST(n*sxx - sx*sx AS BIGINT) AS acf_denx,
                     CAST(n*sxhxh - sxh*sxh AS BIGINT) AS acf_deny,
                     CAST(CASE WHEN n*sxx - sx*sx > 0
                               AND n*sxhxh - sxh*sxh > 0
                          THEN floor(1000.0 * (n*sxy - sx*sxh)
                            / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                              * CAST(n*sxhxh - sxh*sxh AS DOUBLE)))
                          END AS BIGINT) AS r_milli
              FROM agg"""))
  )

  /** W13 flag — SAME text on both engines (cross-engine determinism). */
  private val w13FlagSql: String = {
    val cols = Seq("prc_ew", "prc_vw", "prc_first", "prc_last")
    val nn = cols.map(c => s"(CASE WHEN $c IS NULL THEN 0 ELSE 1 END)").mkString(" + ")
    val mn = cols.map(c => s"coalesce($c, 1e308)").mkString("least(", ", ", ")")
    val mx = cols.map(c => s"coalesce($c, -1e308)").mkString("greatest(", ", ", ")")
    val mean = cols.map(c => s"coalesce($c, 0.0e0)").mkString("(", " + ", s") / ($nn)")
    s"""CASE WHEN $mn < 20.0e0 AND ($nn) >= 2 AND $mean > 0.0e0
          AND ($mx - $mn) / ($mean) > 0.75e0 THEN 1 ELSE 0 END"""
  }
}
