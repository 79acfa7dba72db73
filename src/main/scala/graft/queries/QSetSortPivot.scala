package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations, sorts/top-k, and pivot/reshape (SURVEY.md §2.6–2.7, 2.9).
  *
  * Scale notes: top-k per group is a window rank (single shuffle), never a
  * global sort+limit; the "top-5 + Other" bucket broadcasts the tiny top-5
  * set back against the fact side; pivots enumerate their key values
  * explicitly so Spark skips the extra distinct-collection job.
  */
object QSetSortPivot extends Registry {

  def qs: Seq[Q] = Seq(

    // U1 — UNION ALL of differently-filtered legs re-unified by name
    // (stage0/create_daily_enhanced_trace.py:1569, 2199, 2223).
    Q("u1_union_all",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val big = li.filter(col("l_quantity") >= 45)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            lit("big").as("leg"))
        val ret = li.filter(col("l_returnflag") === "R" && col("l_quantity") < 45)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            lit("returned").as("leg"))
        big.unionByName(ret)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, 'big' AS leg
              FROM lineitem WHERE l_quantity >= 45
              UNION ALL
              SELECT l_orderkey, l_linenumber, l_quantity, 'returned' AS leg
              FROM lineitem WHERE l_returnflag = 'R' AND l_quantity < 45""")),

    // U2 — DISTINCT over a projection
    // (stage0/create_daily_standard_trace.py:266).
    Q("u2_distinct",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""")),

    // U3 — INTERSECT/EXCEPT as semi/anti membership on composite keys
    // (stage0/create_daily_enhanced_trace.py:1698,1733).
    Q("u3_semi_membership",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val keys = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey")).distinct()
        li.join(keys, Seq("l_orderkey"), "left_semi")
          .select(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                   WHERE o_orderpriority = '1-URGENT')""")),

    // O3 — top-N per group via window rank (top bonds by volume,
    // stage1/helper_functions.py:2316-2319): top-3 lineitems per supplier.
    Q("o3_topk_per_group",
      (s, d) => {
        val win = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        Tables.lineitem(s, d)
          .withColumn("rk", row_number().over(win))
          .filter(col("rk") <= 3)
          .select(col("l_suppkey"), col("rk"), col("l_orderkey"),
            col("l_extendedprice"))
      },
      Some("""WITH r AS (
                SELECT l_suppkey, l_orderkey, l_extendedprice,
                       row_number() OVER (PARTITION BY l_suppkey
                         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
                FROM lineitem)
              SELECT l_suppkey, rk, l_orderkey, l_extendedprice
              FROM r WHERE rk <= 3""")),

    // O5 (ext.) — GLOBAL top-k without a global sort: orderBy+limit
    // compiles to TakeOrderedAndProject — per-partition bounded heaps
    // merged at the driver, O(n) scan instead of a full Exchange
    // rangepartitioning + sort. `TopKPlanSpec` pins the physical
    // operator so a regression to the global-sort plan cannot land
    // silently. (Ties break on the full key so the row SET is
    // deterministic, not just the values.)
    Q("o5_global_topk",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_suppkey
              FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
              LIMIT 20""")),

    // O6 (ext.) — top-k per group as a typed AGGREGATOR (bounded-heap
    // buffer, see operators.TopKAgg): unlike o3's window formulation
    // (which sorts every row of a group), the aggregation buffer keeps
    // k-bounded state and MERGES — partial aggregation combines
    // map-side, so the shuffle carries ≤ k rows per (task, group)
    // whatever the group's size. Same answer as the window form by
    // construction (strict total order); the oracle is o3's SQL over
    // exact cents, and `TopKPlanSpec` pins both the ObjectHashAggregate
    // physical operator and the window-equality.
    Q("o6_topk_aggregate",
      (s, d) => {
        val topk = udaf(new graft.operators.TopKByValue(3),
          org.apache.spark.sql.Encoders.product[graft.operators.TopKIn])
        Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100)
              .cast("bigint").as("v"),
            col("l_orderkey"), col("l_linenumber"))
          .groupBy(col("l_suppkey"))
          .agg(topk(col("v"), col("l_orderkey"),
            col("l_linenumber").cast("int")).as("tk"))
          .select(col("l_suppkey"), posexplode(col("tk.items")))
          .select(col("l_suppkey"), (col("pos") + 1).as("rk"),
            col("col.ok").as("l_orderkey"),
            col("col.v").as("price_cents"))
      },
      Some("""WITH r AS (
                SELECT l_suppkey, l_orderkey,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS v,
                       row_number() OVER (PARTITION BY l_suppkey
                         ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT) DESC,
                           l_orderkey, l_linenumber) AS rk
                FROM lineitem)
              SELECT l_suppkey, CAST(rk AS INT) AS rk, l_orderkey,
                     v AS price_cents
              FROM r WHERE rk <= 3""")),

    // O4 — top-5 categories by total + "Other" bucket
    // (stage1/helper_functions.py:5149-5491): exact decimal totals rank
    // the categories; everything else folds into 'Other'.
    Q("o4_top5_other",
      (s, d) => {
        val byType = Tables.part(s, d)
          .groupBy(col("p_type"))
          .agg(sum(col("p_retailprice").cast("decimal(18,2)")).as("tot"))
        // global window over the AGGREGATED type dimension (150 rows at
        // any fact scale) — never the fact table itself
        val win = Window.orderBy(col("tot").desc, col("p_type").asc)
        val flagged = byType
          .withColumn("rk", row_number().over(win))
          .withColumn("category",
            when(col("rk") <= 5, col("p_type")).otherwise(lit("Other")))
        flagged.groupBy(col("category"))
          .agg(Tables.dsum(col("tot")).as("total_retail"))
      },
      Some("""WITH t AS (
                SELECT p_type, sum(CAST(p_retailprice AS DECIMAL(18,2))) AS tot
                FROM part GROUP BY 1),
              r AS (
                SELECT p_type, tot,
                       row_number() OVER (ORDER BY tot DESC, p_type) AS rk
                FROM t)
              SELECT CASE WHEN rk <= 5 THEN p_type ELSE 'Other' END AS category,
                     CAST(sum(CAST(tot AS DECIMAL(18,2))) AS DOUBLE) AS total_retail
              FROM r GROUP BY 1""")),

    // P1 — pivot with explicit key values + first-under-order semantics
    // (W-correction msg/omsg pairing, stage0/create_daily_enhanced_trace
    // .py:1859-1863): earliest event id per type, wide.
    Q("p1_pivot_first",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(min(col("event_id")))
        .withColumnsRenamed(Map(
          "click" -> "first_click", "view" -> "first_view",
          "purchase" -> "first_purchase", "signup" -> "first_signup",
          "error" -> "first_error")),
      Some("""SELECT user_id,
                     min(CASE WHEN event_type = 'click' THEN event_id END) AS first_click,
                     min(CASE WHEN event_type = 'view' THEN event_id END) AS first_view,
                     min(CASE WHEN event_type = 'purchase' THEN event_id END) AS first_purchase,
                     min(CASE WHEN event_type = 'signup' THEN event_id END) AS first_signup,
                     min(CASE WHEN event_type = 'error' THEN event_id END) AS first_error
              FROM events GROUP BY user_id""")),

    // P3 — stack/melt to long form (msg/omsg stacking,
    // stage0/create_daily_enhanced_trace.py:1830-1837) via stack().
    Q("p3_stack_long",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""stack(2, 'price', l_extendedprice, 'discounted',
                  l_extendedprice * (1.0 - l_discount)) AS (kind, amount)"""))
        .withColumn("amount", round(col("amount"), 4)),
      Some("""SELECT l_orderkey, l_linenumber, 'price' AS kind,
                     round(l_extendedprice, 4) AS amount
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'discounted' AS kind,
                     round(l_extendedprice * (1.0 - l_discount), 4) AS amount
              FROM lineitem""")),

    // U4 (ext.) — true INTERSECT / EXCEPT set operators (u3 covered the
    // semi/anti-join membership shapes; these are the bag-to-set
    // operators themselves, planned by Spark as hash left-semi/anti
    // over distinct inputs). Customers appearing in BOTH halves of the
    // date range vs ONLY the early half, as one tagged relation.
    Q("u4_intersect_except",
      (s, d) => {
        val o = Tables.orders(s, d)
        val early = o.filter(col("o_orderdate") < "1997-01-01")
          .select(col("o_custkey"))
        val late = o.filter(col("o_orderdate") >= "1997-01-01")
          .select(col("o_custkey"))
        early.intersect(late).withColumn("tag", lit("both"))
          .unionByName(early.except(late).withColumn("tag", lit("early_only")))
      },
      Some("""SELECT o_custkey, 'both' AS tag FROM (
                SELECT o_custkey FROM orders WHERE o_orderdate < '1997-01-01'
                INTERSECT
                SELECT o_custkey FROM orders WHERE o_orderdate >= '1997-01-01') a
              UNION ALL
              SELECT o_custkey, 'early_only' AS tag FROM (
                SELECT o_custkey FROM orders WHERE o_orderdate < '1997-01-01'
                EXCEPT
                SELECT o_custkey FROM orders WHERE o_orderdate >= '1997-01-01') b""")),

    // P4 (ext.) — UNPIVOT via the first-class Dataset.unpivot API (the
    // melt operator P3 hand-rolled with stack()): wide per-order money
    // columns to (order, metric, value) long form. unpivot KEEPS
    // NULL-valued cells (pandas-melt semantics) — the oracle's union
    // form emits the same null rows.
    Q("p4_unpivot",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("total"),
          when(col("o_orderstatus") === "F",
            col("o_totalprice").cast("decimal(18,2)")).as("finalized"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("total"), col("finalized")),
          "metric", "amount")
        // DOUBLE on the wire: a DECIMAL output column would be the only
        // one in the whole surface, and decimal trailing-zero rendering
        // varies across driver-side conversion paths (the HUGEINT
        // lesson). 2dp values are exact in double.
        .withColumn("amount", col("amount").cast("double")),
      Some("""SELECT o_orderkey, 'total' AS metric,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                       AS amount
              FROM orders
              UNION ALL
              SELECT o_orderkey, 'finalized',
                     CAST(CASE WHEN o_orderstatus = 'F'
                          THEN CAST(o_totalprice AS DECIMAL(18,2)) END
                       AS DOUBLE)
              FROM orders""")),

    // O7 (ext.) — DIVERSIFIED top-k: the global top-20 orders by value
    // subject to a per-customer cap of 2 — search-result diversification
    // as pure relational algebra. The per-customer rank caps each key's
    // contribution FIRST (one keyed shuffle); the global top-20 over the
    // capped slice is orderBy().limit(), which Spark plans as
    // TakeOrderedAndProject (per-partition heaps, k rows to the driver —
    // never a full sort); only the final 20-row rank runs in a trivially
    // bounded window.
    Q("o7_diversified_topk",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .withColumn("ck_rank", row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .filter(col("ck_rank") <= 2)
        perCust
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .select(col("rk"), col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("ck_rank"))
      },
      Some("""WITH capped AS (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS ck_rank
                FROM orders),
              g AS (SELECT *, row_number() OVER (
                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
                    FROM capped WHERE ck_rank <= 2)
              SELECT rk, o_orderkey, o_custkey, o_totalprice, ck_rank
              FROM g WHERE rk <= 20"""))
  )
}
