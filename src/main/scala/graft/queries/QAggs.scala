package graft.queries

import graft.Tables
import graft.agg.DailyMetrics
import graft.operators.{Dedup, Quantiles}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation family (SURVEY.md §2.4) over the synthetic tables.
  *
  * Scale notes: every query here is a single hash-aggregation pass (one
  * shuffle on the group keys, map-side partial aggregation); the panel
  * query replaces the reference's three-groupbys-plus-outer-joins shape
  * with one conditional-aggregate pass. Money sums are decimal-exact (see
  * DailyMetrics) so results are order-independent and hash-stable.
  */
object QAggs extends Registry {

  def qs: Seq[Q] = Seq(

    // A1–A3 — the daily trade panel: ew/vw/par prices, first/last/hi/lo,
    // counts, volumes, value-weighted bid/ask sides — ONE groupBy pass
    // (stage0/create_daily_enhanced_trace.py:205-391).
    Q("a1_daily_panel",
      (s, d) => DailyMetrics.panel(Trades.df(s, d)),
      Some(s"""WITH tr AS (${Trades.sql})
              SELECT id, dt,
                CAST(sum(CAST(price AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS prc_ew,
                CAST(sum(CAST(price * dvol AS DECIMAL(38,6))) AS DOUBLE)
                      / nullif(CAST(sum(CAST(dvol AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS prc_vw,
                CAST(sum(CAST(price * qty AS DECIMAL(38,6))) AS DOUBLE)
                      / nullif(CAST(sum(CAST(qty AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS prc_vw_par,
                CAST(arg_min(price, ord) AS DOUBLE) AS prc_first,
                CAST(arg_max(price, ord) AS DOUBLE) AS prc_last,
                CAST(max(price) AS DOUBLE) AS prc_hi,
                CAST(min(price) AS DOUBLE) AS prc_lo,
                count(*) AS trade_count,
                CAST(CAST(sum(CAST(qty AS DECIMAL(28,6))) AS DECIMAL(28,6)) * 0.000001 AS DOUBLE) AS qvolume,
                CAST(CAST(sum(CAST(dvol AS DECIMAL(28,6))) AS DECIMAL(28,6)) * 0.000001 AS DOUBLE) AS dvolume,
                CAST(sum(CAST(price * dvol AS DECIMAL(38,6))) FILTER (WHERE side = 'B' AND contra = 'C') AS DOUBLE)
                      / nullif(CAST(sum(CAST(dvol AS DECIMAL(38,6))) FILTER (WHERE side = 'B' AND contra = 'C') AS DOUBLE), 0.0) AS prc_bid,
                CAST(arg_max(price, ord) FILTER (WHERE side = 'B' AND contra = 'C') AS DOUBLE) AS bid_last,
                count(*) FILTER (WHERE side = 'B' AND contra = 'C') AS bid_count,
                CAST(sum(CAST(price * dvol AS DECIMAL(38,6))) FILTER (WHERE side = 'S' AND contra = 'C') AS DOUBLE)
                      / nullif(CAST(sum(CAST(dvol AS DECIMAL(38,6))) FILTER (WHERE side = 'S' AND contra = 'C') AS DOUBLE), 0.0) AS prc_ask,
                count(*) FILTER (WHERE side = 'S' AND contra = 'C') AS ask_count,
                CAST(sum(secs) AS DOUBLE) / count(*) AS time_ew,
                arg_max(secs, ord) AS time_last,
                CAST(sum(secs) FILTER (WHERE side = 'B' AND contra = 'C') AS DOUBLE)
                  / nullif(count(*) FILTER (WHERE side = 'B' AND contra = 'C'), 0) AS bid_time_ew,
                arg_max(secs, ord) FILTER (WHERE side = 'B' AND contra = 'C') AS bid_time_last
              FROM tr GROUP BY id, dt""")),

    // A4/A5 — group sizes and min/max dates (bond lifespan shape,
    // stage1/helper_functions.py:1859-1860).
    Q("a5_group_minmax",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          min(to_date(col("o_orderdate"))).as("first_dt"),
          max(to_date(col("o_orderdate"))).as("last_dt")),
      Some("""SELECT o_custkey, count(*) AS n_orders,
                     min(CAST(o_orderdate AS DATE)) AS first_dt,
                     max(CAST(o_orderdate AS DATE)) AS last_dt
              FROM orders GROUP BY o_custkey""")),

    // A6 — descriptive stats: n/mean/std + rank-pick quantiles P1/P5/P95/
    // P99 per group (stage1/helper_functions.py:3664-3700). Grouped per
    // MONTH like the reference's per-date tables — a high-cardinality key,
    // so no window partition ever holds a constant fraction of the table
    // (a 3-value key would sort a third of a 100 TB scan on one task).
    // Variance via exact decimal sums (Σx, Σx²) so it is order-independent;
    // quantiles are rank picks (actual data values), not interpolations —
    // bit-stable across engines; ranks in exact decimal (see Quantiles).
    Q("a6_descriptive_stats",
      (s, d) => {
        val grp = trunc(col("l_shipdate").cast("date"), "MM").as("ship_month")
        val w = Window.partitionBy(col("ship_month"))
          .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        val wg = Window.partitionBy(col("ship_month"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val ranked = Tables.lineitem(s, d)
          .withColumn("ship_month", grp)
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wg))
        def pick(q: Double) = max(when(
          col("rn") === greatest(lit(1L), ceil(lit(BigDecimal(q)) * col("n"))),
          col("l_extendedprice"))).over(wg)
        ranked
          .withColumn("p01", pick(0.01)).withColumn("p05", pick(0.05))
          .withColumn("p95", pick(0.95)).withColumn("p99", pick(0.99))
          .groupBy(col("ship_month"))
          .agg(count(lit(1)).as("n"),
            (Tables.dsum(col("l_extendedprice")) / count(lit(1))).as("mean"),
            // variance via split int64 sums of squared cents: Σc² exceeds
            // 2^53 in decimal int-representation (engines double-round
            // wide decimals differently), but hi = Σ(c² div 1e4) and
            // lo = Σ(c² mod 1e4) each stay exactly int64→double
            // convertible; the recombination is pure IEEE arithmetic —
            // bit-identical everywhere.
            expr("""((cast(sum((cast(floor(l_extendedprice * 100 + 0.5) as bigint) * cast(floor(l_extendedprice * 100 + 0.5) as bigint)) div 10000) as double) * 1e4
                     + cast(sum((cast(floor(l_extendedprice * 100 + 0.5) as bigint) * cast(floor(l_extendedprice * 100 + 0.5) as bigint)) % 10000) as double))
                    - cast(sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) as double)
                      * cast(sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) as double) / count(1))
                   / nullif((count(1) - 1) * 1e4, 0.0d)""").as("variance"),
            min(col("l_extendedprice")).as("mn"),
            max(col("l_extendedprice")).as("mx"),
            max(col("p01")).as("p01"), max(col("p05")).as("p05"),
            max(col("p95")).as("p95"), max(col("p99")).as("p99"))
      },
      Some("""WITH ranked AS (
                SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS ship_month,
                       l_extendedprice,
                       row_number() OVER (PARTITION BY date_trunc('month', CAST(l_shipdate AS DATE))
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                       count(*) OVER (PARTITION BY date_trunc('month', CAST(l_shipdate AS DATE))) AS n
                FROM lineitem),
              picks AS (
                SELECT ship_month, l_extendedprice, n,
                  max(CASE WHEN rn = greatest(1, CAST(ceil(0.01 * n) AS BIGINT)) THEN l_extendedprice END)
                    OVER (PARTITION BY ship_month) AS p01,
                  max(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT)) THEN l_extendedprice END)
                    OVER (PARTITION BY ship_month) AS p05,
                  max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN l_extendedprice END)
                    OVER (PARTITION BY ship_month) AS p95,
                  max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN l_extendedprice END)
                    OVER (PARTITION BY ship_month) AS p99
                FROM ranked)
              SELECT CAST(ship_month AS DATE) AS ship_month, count(*) AS n,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
                ((CAST(sum((CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 10000) AS DOUBLE) * 1e4
                  + CAST(sum((CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) % 10000) AS DOUBLE))
                 - CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   * CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / count(*))
                / nullif((count(*) - 1) * 1e4, 0.0e0) AS variance,
                min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
                max(p01) AS p01, max(p05) AS p05, max(p95) AS p95, max(p99) AS p99
              FROM picks GROUP BY ship_month""")),

    // A7 — cross-sectional stats: per-day means, then the time-series mean
    // of the daily stat (stage1/helper_functions.py:3703-3751). Re-averaging
    // derived means is done in exact fixed-point (micro-unit bigints with
    // floor division) — re-aggregating rounded doubles is the one shape
    // where engines' rounding rules genuinely diverge.
    Q("a7_cross_sectional",
      (s, d) => Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(
          // day mean in exact micro-units: (cents * 1e4) div n
          expr("(cast(sum(cast(value as decimal(18,2))) * 100 as bigint) * 10000) div count(1)")
            .as("day_mean_u"),
          count(lit(1)).as("day_n"))
        .agg(
          expr("cast(sum(day_mean_u) div count(1) as double) / 1e6")
            .as("mean_of_day_means"),
          (Tables.dsum(col("day_n")) / count(lit(1))).as("mean_day_n"),
          count(lit(1)).as("n_days")),
      Some("""WITH daily AS (
                SELECT CAST(ts AS DATE) AS dt,
                       (CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) * 10000) // count(*) AS day_mean_u,
                       count(*) AS day_n
                FROM events GROUP BY 1)
              SELECT CAST(sum(day_mean_u) // count(*) AS DOUBLE) / 1e6 AS mean_of_day_means,
                     CAST(sum(CAST(day_n AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_day_n,
                     count(*) AS n_days
              FROM daily""")),

    // A8 — winsorization: clip values into per-group rank quantiles
    // [q0.005, q0.995] (stage1/stage1_pipeline.py:1950-1961). Grouped per
    // SHIP DATE exactly like the reference's per-trade-date clip — the
    // group key cardinality grows with the data, so the per-group window
    // sort parallelizes at 100× instead of concentrating on 3 keys.
    Q("a8_winsorize",
      (s, d) => Quantiles.winsorize(
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_shipdate").cast("date").as("ship_dt"),
              col("l_extendedprice")),
          groups = Seq("ship_dt"),
          valueCol = "l_extendedprice",
          tieBreak = Seq(col("l_orderkey"), col("l_linenumber")),
          qLo = 0.005, qHi = 0.995,
          outCol = "price_w")
        .select(col("l_orderkey"), col("l_linenumber"), col("price_w")),
      Some("""WITH ranked AS (
                SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_dt, l_extendedprice,
                       row_number() OVER (PARTITION BY CAST(l_shipdate AS DATE)
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                       count(*) OVER (PARTITION BY CAST(l_shipdate AS DATE)) AS n
                FROM lineitem),
              bounds AS (
                SELECT l_orderkey, l_linenumber, l_extendedprice,
                  max(CASE WHEN rn = greatest(1, CAST(ceil(0.005 * n) AS BIGINT)) THEN l_extendedprice END)
                    OVER (PARTITION BY ship_dt) AS lo,
                  max(CASE WHEN rn = greatest(1, CAST(ceil(0.995 * n) AS BIGINT)) THEN l_extendedprice END)
                    OVER (PARTITION BY ship_dt) AS hi
                FROM ranked)
              SELECT l_orderkey, l_linenumber,
                     least(greatest(l_extendedprice, lo), hi) AS price_w
              FROM bounds""")),

    // A9 — concentration stats: per-supplier volume shares, cumulative
    // share thresholds, top-N shares, Herfindahl
    // (stage1/helper_functions.py:2267-2334). All sums decimal-exact. The
    // cumulative walk uses the two-phase distributed prefix sum
    // (operators.PrefixSum) — a bare Window.orderBy cumsum would move the
    // whole table to ONE partition, the classic scale cliff; totals come
    // from a broadcast scalar aggregate for the same reason.
    Q("a9_concentration",
      (s, d) => {
        val vol = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("v"))
        // persistInput=true: vol is only #suppliers rows but its CHILD is a
        // full lineitem scan+shuffle — repartitionByRange's sampling pass
        // would re-run that scan, and measured head-to-head the persist is
        // 4x faster (1.1 s vs 4.7 s at sf0.1). 8 ranges bound task overhead
        // for a dimension-sized frame (pass a larger hint for fact-sized
        // inputs). grandTotals rides along from PrefixSum's driver-side
        // prefix — no third pass over lineitem and no broadcast cross-join
        // for tot/nsupp.
        graft.operators.PrefixSum.withRunningSumAndRank(
            vol,
            order = Seq(col("v").desc, col("l_suppkey").asc),
            valueCol = col("v"),
            outCol = "cum", rankCol = "rk",
            numPartitions = 8, persistInput = true,
            grandTotals = Some(("tot", "nsupp")))
          .withColumn("vu", expr("cast(v * 100 as bigint) div 100000"))
          .agg(
            count(when(col("cum") < col("tot") * 0.5, 1)).as("n_50"),
            count(when(col("cum") < col("tot") * 0.75, 1)).as("n_75"),
            count(when(col("cum") < col("tot") * 0.9, 1)).as("n_90"),
            (Tables.dsum(when(col("rk") <= ceil(col("nsupp") * 0.1),
              col("v")).otherwise(lit(0))) /
              max(col("tot").cast("double"))).as("top10_share"),
            // herfindahl in bigint fixed-point: volumes floored to 1e3-
            // dollar units keep v², Σv² and totals below 2^53, so every
            // int→double cast is exact — wide-decimal→double casts double-
            // round differently across engines.
            expr("""cast(sum(vu * vu) as double)
                    / (cast(sum(vu) as double) * cast(sum(vu) as double))
                    * 10000""").as("herfindahl"))
      },
      Some("""WITH vol AS (
                SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
                FROM lineitem GROUP BY 1),
              cw AS (
                SELECT l_suppkey, v,
                       CAST(v * 100 AS BIGINT) // 100000 AS vu,
                       sum(v) OVER (ORDER BY v DESC, l_suppkey
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(v) OVER () AS tot,
                       row_number() OVER (ORDER BY v DESC, l_suppkey) AS rk,
                       count(*) OVER () AS nsupp
                FROM vol)
              SELECT count(CASE WHEN cum < tot * 0.5 THEN 1 END) AS n_50,
                     count(CASE WHEN cum < tot * 0.75 THEN 1 END) AS n_75,
                     count(CASE WHEN cum < tot * 0.9 THEN 1 END) AS n_90,
                     CAST(sum(CASE WHEN rk <= ceil(nsupp * 0.1) THEN CAST(v AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                           / max(CAST(tot AS DOUBLE)) AS top10_share,
                     CAST(sum(vu * vu) AS DOUBLE)
                           / (CAST(sum(vu) AS DOUBLE) * CAST(sum(vu) AS DOUBLE)) * 10000 AS herfindahl
              FROM cw""")),

    // A10 — trade counts by month INCLUDING zero months inside each
    // customer's alive window (stage1/helper_functions.py:1814-1907):
    // sequence(first_month, last_month) + explode replaces the reference's
    // per-month python loop; left join + coalesce(0) fills gaps.
    Q("a10_alive_months",
      (s, d) => {
        val o = Tables.orders(s, d)
          .withColumn("m", trunc(to_date(col("o_orderdate")), "MM"))
        val alive = o.groupBy(col("o_custkey"))
          .agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
          .select(col("o_custkey"),
            explode(sequence(col("m0"), col("m1"),
              expr("interval 1 month"))).as("m"))
        val counts = o.groupBy(col("o_custkey"), col("m"))
          .agg(count(lit(1)).as("cnt"))
        alive.join(counts, Seq("o_custkey", "m"), "left")
          .select(col("o_custkey"), col("m").as("month_start"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"))
      },
      // month stepping from a first-of-month start is cumulative-safe
      // (day 1 always valid), so generate_series matches Spark sequence.
      Some("""WITH o AS (
                SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS m
                FROM orders),
              alive AS (
                SELECT o_custkey, unnest(generate_series(min(m), max(m),
                       INTERVAL 1 MONTH)) AS m
                FROM o GROUP BY o_custkey),
              counts AS (
                SELECT o_custkey, m, count(*) AS cnt FROM o GROUP BY 1, 2)
              SELECT a.o_custkey, CAST(a.m AS DATE) AS month_start,
                     coalesce(c.cnt, 0) AS n_orders
              FROM alive a LEFT JOIN counts c
                ON a.o_custkey = c.o_custkey AND a.m = c.m""")),

    // A11 — weekly resample means (stage1/helper_functions.py:1312-1780):
    // date_trunc('week') + one aggregation pass.
    Q("a11_weekly_resample",
      (s, d) => Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).cast("date").as("week_start"))
        .agg((Tables.dsum(col("value")) / count(lit(1))).as("mean_value"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value,
                     count(*) AS n
              FROM events GROUP BY 1""")),

    // A12 — dedup with priority: one row per (id, dt), Enhanced>Standard>
    // 144A priority order (stage1/stage1_pipeline.py:249-255) — row_number
    // over an explicit total order, never sort+dropDuplicates.
    Q("a12_dedup_priority",
      (s, d) => Dedup.keepFirst(
          Trades.df(s, d),
          keys = Seq("id", "dt"),
          order = Seq(col("side").asc, col("ord").asc))
        .select(col("id"), col("dt"), col("ord"), col("side")),
      Some(s"""WITH tr AS (${Trades.sql}),
              r AS (SELECT id, dt, ord, side,
                      row_number() OVER (PARTITION BY id, dt
                        ORDER BY side, ord) AS rn FROM tr)
              SELECT id, dt, ord, side FROM r WHERE rn = 1""")),

    // A13 — dedup keep-last under order (latest amount-outstanding per key,
    // stage1/stage1_pipeline.py:722-726).
    Q("a13_dedup_keeplast",
      (s, d) => Dedup.keepLast(
          Tables.orders(s, d),
          keys = Seq("o_custkey"),
          order = Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
              SELECT o_custkey, o_orderkey, o_orderdate FROM r WHERE rn = 1""")),

    // A14 — distinct key lists (flagged-CUSIP export shape,
    // stage0/create_daily_enhanced_trace.py:2828-2835).
    Q("a14_distinct_keys",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct(),
      Some("""SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    // A15 (ext.) — GLOBAL exact quantiles without the single-partition
    // sort cliff. [[graft.operators.Quantiles]] covers per-GROUP rank
    // quantiles (the window shuffles on the group key); the global case
    // (`descriptive P1..P99 of the whole panel`, stage1/helper_functions
    // .py:3664-3751 run over the full frame) has no group key to shuffle
    // on, and `Window.orderBy` without partitions drags every row to one
    // task. Here the global rank comes from the two-phase PrefixSum
    // (range-partition → local rank → driver prefix over #partitions
    // rows), then each target rank is picked by a broadcast theta-join
    // against a 5-row quantile table. Ranks are integer-exact:
    // ceil(q·n) = (q_num·n + q_den − 1) div q_den — no double rounding
    // to disagree across engines. Scale: one range shuffle + local sort,
    // identical shape at any row count; ties on price are harmless (any
    // tie order puts the same VALUE at a given rank).
    Q("a15_exact_quantiles",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select(col("l_extendedprice").as("v"),
            col("l_orderkey"), col("l_linenumber"))
        val ranked = graft.operators.PrefixSum.withRunningSumAndRank(
          li,
          order = Seq(col("v").asc, col("l_orderkey").asc,
            col("l_linenumber").asc),
          valueCol = lit(0L),
          outCol = "cum0", rankCol = "rk",
          persistInput = false,
          grandTotals = Some(("z0", "n_rows")))
        val qDf = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L),
          ("p90", 9L, 10L), ("p99", 99L, 100L))
          .toDF("q_label", "q_num", "q_den")
        val target = expr("(q_num * n_rows + q_den - 1) div q_den")
        ranked.join(broadcast(qDf), col("rk") === target)
          .select(col("q_label"), target.as("target_rank"),
            col("v").as("value"))
      },
      Some("""WITH ranked AS (
                SELECT l_extendedprice AS v,
                       row_number() OVER (ORDER BY l_extendedprice,
                                          l_orderkey, l_linenumber) AS rk,
                       count(*) OVER () AS n_rows
                FROM lineitem),
              qs AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
                       ('p75', 3, 4), ('p90', 9, 10), ('p99', 99, 100))
                       q(q_label, q_num, q_den))
              SELECT q_label,
                     CAST((q_num * n_rows + q_den - 1) // q_den AS BIGINT)
                       AS target_rank,
                     v AS value
              FROM ranked JOIN qs
                ON rk = (q_num * n_rows + q_den - 1) // q_den""")),

    // A17 (ext.) — exact per-GROUP quantiles: the grouped complement of
    // a15 (whose PrefixSum machinery exists to avoid a single-partition
    // global sort). Within a group no such problem exists — the
    // in-group row_number IS the distributed per-group sort, groups
    // scale out across reducers, and one window pass serves every
    // quantile via the broadcast (q × group) probe. Values in exact
    // cents; ties take the lowest (value, orderkey, linenumber) — any
    // tie order puts the same VALUE at a given rank.
    Q("a17_grouped_quantiles",
      (s, d) => {
        import s.implicits._
        val g = Seq(col("l_returnflag"), col("l_linestatus"))
        val base = Tables.lineitem(s, d).select(
          col("l_returnflag"), col("l_linestatus"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint").as("v"),
          col("l_orderkey"), col("l_linenumber"))
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(g: _*)
          .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy(g: _*)
        val qDf = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
          .toDF("q_label", "q_num", "q_den")
        val target = expr("(q_num * n + q_den - 1) div q_den")
        base.withColumn("rk", row_number().over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .crossJoin(broadcast(qDf))
          .filter(col("rk") === target)
          .select(col("l_returnflag"), col("l_linestatus"), col("q_label"),
            target.as("target_rank"), col("v").as("value_cents"))
      },
      Some("""WITH base AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS v,
                       row_number() OVER (PARTITION BY l_returnflag,
                           l_linestatus
                         ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * 100 AS BIGINT), l_orderkey, l_linenumber) AS rk,
                       count(*) OVER (PARTITION BY l_returnflag,
                         l_linestatus) AS n
                FROM lineitem),
              qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                       ('p99', 99, 100)) q(q_label, q_num, q_den))
              SELECT l_returnflag, l_linestatus, q_label,
                     CAST((q_num * n + q_den - 1) // q_den AS BIGINT)
                       AS target_rank,
                     v AS value_cents
              FROM base JOIN qs
                ON rk = (q_num * n + q_den - 1) // q_den""")),

    // A19 (ext.) — LINEAR-INTERPOLATED quantiles (numpy/pandas type 7,
    // the reference's `.quantile()`/describe default — a15/a17 are
    // rank-pick): h = (n−1)q lands between ranks, and the value is
    // v_lo + (v_hi − v_lo)·frac. Everything stays in exact integers:
    // h in HUNDREDTHS (h100 = (n−1)·k for q = k/100), frac = h100 mod
    // 100, and the interpolated value in milli-cents =
    // v_lo·1000 + (v_hi − v_lo)·frac·10 — no IEEE division anywhere,
    // so the hash compare is bit-exact. Ranks come from the same
    // two-phase PrefixSum as a15 (no single-partition window); the two
    // neighbor lookups are broadcast joins against the 5-row quantile
    // frame.
    Q("a19_interp_quantiles",
      (s, d) => {
        import s.implicits._
        val cents = Tables.lineitem(s, d).select(
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint").as("v"),
          col("l_orderkey"), col("l_linenumber"))
        val ranked = graft.operators.PrefixSum.withRunningSumAndRank(
          cents,
          order = Seq(col("v").asc, col("l_orderkey").asc,
            col("l_linenumber").asc),
          valueCol = lit(0L),
          outCol = "cum0", rankCol = "rk",
          persistInput = false,
          grandTotals = Some(("z0", "n_rows")))
        val rankedP = graft.Caches.registerTransient(
          ranked.select(col("v"), col("rk"), col("n_rows"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val qDf = Seq(("p25", 25L), ("p50", 50L), ("p75", 75L),
          ("p90", 90L), ("p99", 99L)).toDF("q_label", "k")
        val h100 = expr("(n_rows - 1) * k")
        val loRank = expr("((n_rows - 1) * k) div 100 + 1")
        val lo = rankedP.crossJoin(broadcast(qDf))
          .filter(col("rk") === loRank)
          .select(col("q_label"), col("k"), col("n_rows"),
            h100.as("h100"), col("v").as("v_lo"))
        val hi = rankedP.crossJoin(broadcast(qDf))
          .filter(col("rk") ===
            expr("least(((n_rows - 1) * k) div 100 + 2, n_rows)"))
          .select(col("q_label"), col("v").as("v_hi"))
        lo.join(broadcast(hi), Seq("q_label"))
          .select(col("q_label"), col("v_lo"), col("v_hi"),
            (col("v_lo") * 1000 +
              (col("v_hi") - col("v_lo")) * (col("h100") % 100) * 10)
              .as("interp_milli"))
      },
      Some("""WITH ranked AS (
                SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS v,
                       row_number() OVER (ORDER BY
                         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT), l_orderkey, l_linenumber) AS rk,
                       count(*) OVER () AS n_rows
                FROM lineitem),
              qs AS (SELECT * FROM (VALUES ('p25', 25), ('p50', 50),
                       ('p75', 75), ('p90', 90), ('p99', 99))
                       q(q_label, k)),
              lo AS (SELECT q_label, k, n_rows,
                            (n_rows - 1) * k AS h100, v AS v_lo
                     FROM ranked JOIN qs
                       ON rk = ((n_rows - 1) * k) // 100 + 1),
              hi AS (SELECT q_label, v AS v_hi
                     FROM ranked JOIN qs
                       ON rk = least(((n_rows - 1) * k) // 100 + 2,
                                     n_rows))
              SELECT q_label, v_lo, v_hi,
                     v_lo * 1000 + (v_hi - v_lo) * (h100 % 100) * 10
                       AS interp_milli
              FROM lo JOIN hi USING (q_label)""")),

    // A16 (ext.) — ROLLUP aggregation: the (flag, status) / (flag) /
    // grand-total report in ONE pass. Spark plans grouping sets as a
    // single Expand + hash-agg — no per-level re-scan; NULL is the
    // subtotal marker and gid disambiguates a real NULL group from a
    // rolled-up one (none here, but the column is the contract).
    Q("a16_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          Tables.dsum(col("l_extendedprice")).as("sum_price"),
          (grouping(col("l_returnflag")) * 2
            + grouping(col("l_linestatus"))).cast("int").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS sum_price,
                     CAST(GROUPING(l_returnflag) * 2
                       + GROUPING(l_linestatus) AS INT) AS gid
              FROM lineitem
              GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // A18 (ext.) — CUBE aggregation: all four grouping sets of
    // (returnflag, linestatus) in one Expand + hash-agg pass (rollup's
    // hierarchical subset was a16; the cube adds the column-marginal
    // sets a report matrix needs). gid = grouping bitmask, the contract
    // that separates a rolled-up NULL from a data NULL.
    Q("a18_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          Tables.dsum(col("l_extendedprice")).as("sum_price"),
          (grouping(col("l_returnflag")) * 2
            + grouping(col("l_linestatus"))).cast("int").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS sum_price,
                     CAST(GROUPING(l_returnflag) * 2
                       + GROUPING(l_linestatus) AS INT) AS gid
              FROM lineitem
              GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // A21 (ext.) — deterministic per-group MODE: the most frequent
    // quantity per return flag, ties broken by the smaller value.
    // Neither engine's built-in mode() pins tie order, so both sides
    // run the same count + rank construction — two hash-aggs and a
    // group-cardinality window, no raw-row sort.
    Q("a21_group_mode",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("freq"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("l_returnflag"))
            .orderBy(col("freq").desc, col("l_quantity"))))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"),
          col("l_quantity").as("mode_qty"), col("freq")),
      Some("""WITH c AS (SELECT l_returnflag, l_quantity,
                           count(*) AS freq
                         FROM lineitem GROUP BY 1, 2),
              r AS (SELECT *, row_number() OVER (
                      PARTITION BY l_returnflag
                      ORDER BY freq DESC, l_quantity) AS rn
                    FROM c)
              SELECT l_returnflag, l_quantity AS mode_qty, freq
              FROM r WHERE rn = 1""")),

    // A22 (ext.) — WEIGHTED median: the volume-weighted median price
    // per return flag (the "half the volume traded at or below" level —
    // the robust VWAP companion a6's unweighted median can't express).
    // Lower weighted median in exact integers: running quantity along
    // the price order (one keyed shuffle+sort), first row where
    // 2·cum ≥ total. Quantities ride as integer hundredths and prices
    // as cents, so the crossing comparison is bit-identical in both
    // engines.
    Q("a22_weighted_median",
      (s, d) => {
        val base = Tables.lineitem(s, d).select(
          col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("price_cents"),
          (col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("long").as("qty_h"),
          col("l_orderkey"), col("l_linenumber"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("price_cents"), col("l_orderkey"),
            col("l_linenumber"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val tot = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
        base
          .withColumn("cum", sum(col("qty_h")).over(w))
          .withColumn("total", sum(col("qty_h")).over(tot))
          .filter(col("cum") * 2 >= col("total"))
          .groupBy(col("l_returnflag"))
          .agg(min(col("price_cents")).as("wmedian_cents"),
            max(col("total")).as("total_qty_h"))
      },
      Some("""WITH b AS (
                SELECT l_returnflag,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS price_cents,
                       CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS qty_h,
                       l_orderkey, l_linenumber
                FROM lineitem),
              c AS (SELECT l_returnflag, price_cents,
                      CAST(sum(qty_h) OVER (PARTITION BY l_returnflag
                        ORDER BY price_cents, l_orderkey, l_linenumber
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                      CAST(sum(qty_h) OVER (PARTITION BY l_returnflag)
                        AS BIGINT) AS total
                    FROM b)
              SELECT l_returnflag,
                     min(price_cents) AS wmedian_cents,
                     max(total) AS total_qty_h
              FROM c WHERE cum * 2 >= total
              GROUP BY 1""")),

    // A23 (ext.) — Fama–MacBeth two-stage panel regression, the
    // canonical cross-sectional estimator of the reference's domain
    // (the reference exports its panel and runs per-date regressions in
    // pandas; here BOTH stages are hash aggregates). Stage 1: for every
    // ship date, the cross-sectional OLS slope of price-cents on
    // quantity from integer sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    // — ONE groupBy(date), no window, no per-date loop; the slope ships
    // in exact cents-per-unit via the truncating integer division both
    // engines share (the w18 contract). Stage 2: the time-series
    // moments of the per-date slopes per YEAR — mean (truncating div)
    // and the exact variance numerator T·Σs² − (Σs)², all BIGINT, so
    // the dispersion that prices the estimator's standard error is
    // hash-exact. Scale shape: two exchanges, each carrying group-
    // cardinality rows (dates, then years); a 100 TB panel's stage 1
    // partial-aggregates map-side to |dates| rows per task.
    Q("a23_fama_macbeth",
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .select(to_date(col("l_shipdate")).as("ship_d"),
            col("l_quantity").cast("decimal(18,2)").cast("bigint").as("x"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100)
              .cast("bigint").as("y"))
          .groupBy(col("ship_d"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("den") =!= 0L)
          .select(col("ship_d"),
            expr("(n * sxy - sx * sy) div den").as("slope_cent"))
        daily
          .groupBy(year(col("ship_d")).as("yr"))
          .agg(count(lit(1)).as("n_dates"),
            sum(col("slope_cent")).as("ss"),
            sum(col("slope_cent") * col("slope_cent")).as("ss2"))
          .select(col("yr"), col("n_dates"),
            expr("ss div n_dates").as("fm_mean_cent"),
            (col("n_dates") * col("ss2") - col("ss") * col("ss"))
              .as("fm_var_num"))
      },
      Some("""WITH base AS (
                SELECT CAST(l_shipdate AS DATE) AS ship_d,
                       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)
                         AS x,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS y
                FROM lineitem),
              daily AS (
                SELECT ship_d, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx
                FROM base GROUP BY 1),
              slopes AS (
                SELECT ship_d,
                       CAST((n * sxy - sx * sy)
                         // (n * sxx - sx * sx) AS BIGINT) AS slope_cent
                FROM daily WHERE n * sxx - sx * sx <> 0)
              SELECT CAST(year(ship_d) AS INT) AS yr,
                     CAST(count(*) AS BIGINT) AS n_dates,
                     CAST(sum(slope_cent) // count(*) AS BIGINT)
                       AS fm_mean_cent,
                     CAST(count(*) * sum(slope_cent * slope_cent)
                       - sum(slope_cent) * sum(slope_cent) AS BIGINT)
                       AS fm_var_num
              FROM slopes GROUP BY 1"""))
  )
}
