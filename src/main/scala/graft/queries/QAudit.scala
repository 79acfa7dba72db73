package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectations suite (SURVEY §2.12 audit family, extended
  * in the Deequ/Great-Expectations direction the reference approximates
  * with its hand-rolled report tables — `stage1/helper_functions.py`'s
  * data-quality LaTeX blocks reduce to exactly these metrics: null
  * shares, key uniqueness, domain membership, bound violations).
  *
  * One row per constraint: (tbl, constraint, metric, threshold, passed).
  * Scale shape: every per-table metric family is ONE aggregate pass over
  * that table (FILTER-conditional counts — no per-constraint scans); the
  * two referential-integrity checks are each one join-agg whose build
  * side is the dimension. Metrics are count ratios, so the doubles are
  * single exact-int divisions — bit-stable across engines.
  */
object QAudit extends Registry {

  /** (tbl, constraint, metric) → constraint row with pass verdict. */
  private def row(tbl: String, name: String, metric: Column,
      threshold: Double): Column =
    struct(lit(tbl).as("tbl"), lit(name).as("check_name"),
      metric.cast("double").as("metric"),
      lit(threshold).as("threshold"),
      (metric.cast("double") >= lit(threshold)).cast("int").as("passed"))

  private def expectations(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val customer = Tables.customer(s, d)

    // one aggregate pass over orders: completeness, uniqueness, domain
    val ordersPass = orders.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("n_custkey"),
      countDistinct(col("o_orderkey")).as("n_key"),
      count(when(col("o_orderstatus").isin("F", "O", "P"), 1)).as("n_dom3"),
      count(when(col("o_orderstatus").isin("F", "O"), 1)).as("n_dom2"))
      .select(explode(array(
        row("orders", "completeness(o_custkey)",
          col("n_custkey") / col("n"), 1.0),
        row("orders", "uniqueness(o_orderkey)",
          col("n_key") / col("n"), 1.0),
        row("orders", "domain(o_orderstatus in F,O,P)",
          col("n_dom3") / col("n"), 1.0),
        // deliberately tighter domain so the suite demonstrably FAILS a
        // constraint on healthy data ('P' rows exist) — a report where
        // every verdict is 1 can't prove the verdict logic runs
        row("orders", "domain(o_orderstatus in F,O)",
          col("n_dom2") / col("n"), 1.0))).as("c"))

    // one pass over lineitem: bounds + size
    val liPass = lineitem.agg(
      count(lit(1)).as("n"),
      count(when(col("l_discount").between(0.0, 0.1), 1)).as("n_disc"),
      count(when(col("l_quantity") > 0, 1)).as("n_qty"))
      .select(explode(array(
        row("lineitem", "bounds(l_discount in [0,0.1])",
          col("n_disc") / col("n"), 1.0),
        row("lineitem", "positive(l_quantity)",
          col("n_qty") / col("n"), 1.0),
        row("lineitem", "size(count >= 1)",
          (col("n") >= 1).cast("int"), 1.0))).as("c"))

    // referential integrity: share of orders whose customer exists —
    // LEFT join against the (smaller) dimension, counted in one agg
    val ri = orders.join(
        customer.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left")
      .agg((count(col("c_custkey")) / count(lit(1))).as("m"))
      .select(explode(array(
        row("orders", "ref_integrity(o_custkey -> customer)",
          col("m"), 1.0))).as("c"))

    ordersPass.unionByName(liPass).unionByName(ri).select(col("c.*"))
  }

  def qs: Seq[Q] = Seq(
    Q("audit_expectations",
      (s, d) => expectations(s, d),
      Some("""WITH o AS (
                SELECT count(*) AS n,
                       count(o_custkey) AS n_custkey,
                       count(DISTINCT o_orderkey) AS n_key,
                       count(*) FILTER (WHERE o_orderstatus IN ('F','O','P'))
                         AS n_dom3,
                       count(*) FILTER (WHERE o_orderstatus IN ('F','O'))
                         AS n_dom2
                FROM orders),
              l AS (
                SELECT count(*) AS n,
                       count(*) FILTER (WHERE l_discount BETWEEN 0.0 AND 0.1)
                         AS n_disc,
                       count(*) FILTER (WHERE l_quantity > 0) AS n_qty
                FROM lineitem),
              ri AS (
                SELECT CAST(count(c.c_custkey) AS DOUBLE) / count(*) AS m
                FROM orders o2
                LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                  ON o2.o_custkey = c.c_custkey),
              rows_all AS (
                SELECT 'orders' AS tbl, 'completeness(o_custkey)' AS check_name,
                       CAST(n_custkey AS DOUBLE) / n AS metric FROM o
                UNION ALL
                SELECT 'orders', 'uniqueness(o_orderkey)',
                       CAST(n_key AS DOUBLE) / n FROM o
                UNION ALL
                SELECT 'orders', 'domain(o_orderstatus in F,O,P)',
                       CAST(n_dom3 AS DOUBLE) / n FROM o
                UNION ALL
                SELECT 'orders', 'domain(o_orderstatus in F,O)',
                       CAST(n_dom2 AS DOUBLE) / n FROM o
                UNION ALL
                SELECT 'lineitem', 'bounds(l_discount in [0,0.1])',
                       CAST(n_disc AS DOUBLE) / n FROM l
                UNION ALL
                SELECT 'lineitem', 'positive(l_quantity)',
                       CAST(n_qty AS DOUBLE) / n FROM l
                UNION ALL
                SELECT 'lineitem', 'size(count >= 1)',
                       CAST(CASE WHEN n >= 1 THEN 1 ELSE 0 END AS DOUBLE) FROM l
                UNION ALL
                SELECT 'orders', 'ref_integrity(o_custkey -> customer)',
                       m FROM ri)
              SELECT tbl, check_name, metric,
                     CAST(1.0 AS DOUBLE) AS threshold,
                     CAST(CASE WHEN metric >= 1.0 THEN 1 ELSE 0 END AS INT)
                       AS passed
              FROM rows_all"""))
    ,

    // Column profiling: a 20-bucket equi-width histogram of
    // o_totalprice — the distribution fingerprint a data catalog keeps
    // per column (and the drift detector's input). TWO passes by
    // necessity (bucket edges need global min/max), the second a single
    // hash-agg on the bucket index; the 1-row stats frame rides along
    // as a broadcast. Bucket arithmetic is shared-text IEEE on both
    // engines; the top edge is clamped so max lands in the last bucket.
    Q("audit_histogram",
      (s, d) => {
        val stats = Tables.orders(s, d)
          .agg(min(col("o_totalprice")).as("mn"),
            max(col("o_totalprice")).as("mx"))
        Tables.orders(s, d).join(broadcast(stats))
          .select(least(floor((col("o_totalprice") - col("mn"))
              * 20.0 / (col("mx") - col("mn"))), lit(19.0))
            .cast("long").as("bucket"), col("mn"), col("mx"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            (min(col("mn")) + col("bucket") * (min(col("mx")) - min(col("mn")))
              / 20.0).as("lo"),
            (min(col("mn")) + (col("bucket") + 1) * (min(col("mx"))
              - min(col("mn"))) / 20.0).as("hi"))
          .select(col("bucket"), col("lo"), col("hi"), col("n_rows"))
      },
      Some("""WITH st AS (SELECT min(o_totalprice) AS mn,
                                 max(o_totalprice) AS mx FROM orders),
              b AS (SELECT CAST(least(floor((o_totalprice - mn) * 20.0
                             / (mx - mn)), 19.0) AS BIGINT) AS bucket,
                           mn, mx
                    FROM orders CROSS JOIN st)
              SELECT bucket,
                     min(mn) + bucket * (min(mx) - min(mn)) / 20.0 AS lo,
                     min(mn) + (bucket + 1) * (min(mx) - min(mn)) / 20.0 AS hi,
                     count(*) AS n_rows
              FROM b GROUP BY 1""")),

    // Distribution-drift detector: the population-stability-index the
    // monitoring layer runs when a new ingest window lands — has
    // o_totalprice's distribution moved between the pre-1996 and 1996+
    // periods? Shared bucket edges from the GLOBAL min/max, Laplace
    // +1 smoothing so empty buckets stay defined, and the log-ratio in
    // integer milli-bits via the native Log2Milli expression (the same
    // integer log the LM-perplexity stack uses), so every PSI term is
    // an exact BIGINT both engines reproduce. Two FILTER counts per
    // bucket in ONE aggregation pass; the stats frame broadcasts.
    // psi_term > 0 ⟺ the bucket's share moved; Σ terms (in
    // milli·milli-bits) is the headline PSI.
    Q("audit_drift_psi",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val stats = orders.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        val isA = col("o_orderdate") < "1996-01-01"
        val bucketed = graft.Caches.registerTransient(
          orders.join(broadcast(stats))
            .select(least(floor((col("o_totalprice") - col("mn"))
                * 10.0 / (col("mx") - col("mn"))), lit(9.0))
              .cast("long").as("bucket"), isA.as("in_a"))
            .groupBy(col("bucket"))
            .agg((count(when(col("in_a"), 1)) + 1L).as("c_a"),
              (count(when(!col("in_a"), 1)) + 1L).as("c_b"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val tots = bucketed.agg(sum(col("c_a")).as("tot_a"),
          sum(col("c_b")).as("tot_b"))
        bucketed.join(broadcast(tots))
          .select(col("bucket"), (col("c_a") - 1L).as("n_a"),
            (col("c_b") - 1L).as("n_b"),
            ((expr("(c_a * 1000) div tot_a") - expr("(c_b * 1000) div tot_b"))
              * (call_function("log2milli", col("c_a") * col("tot_b")) -
                 call_function("log2milli", col("c_b") * col("tot_a"))))
              .as("psi_term"))
      },
      Some {
        val l2m = QText.l2mSql
        s"""WITH st AS (SELECT min(o_totalprice) AS mn,
                               max(o_totalprice) AS mx FROM orders),
            b AS (SELECT CAST(least(floor((o_totalprice - mn) * 10.0
                           / (mx - mn)), 9.0) AS BIGINT) AS bucket,
                         o_orderdate < TIMESTAMP '1996-01-01' AS in_a
                  FROM orders CROSS JOIN st),
            cnt AS (SELECT bucket,
                           CAST(count(*) FILTER (WHERE in_a) + 1 AS BIGINT)
                             AS c_a,
                           CAST(count(*) FILTER (WHERE NOT in_a) + 1 AS BIGINT)
                             AS c_b
                    FROM b GROUP BY 1),
            t AS (SELECT CAST(sum(c_a) AS BIGINT) AS tot_a,
                         CAST(sum(c_b) AS BIGINT) AS tot_b FROM cnt)
            SELECT bucket, c_a - 1 AS n_a, c_b - 1 AS n_b,
                   ((c_a * 1000) // tot_a - (c_b * 1000) // tot_b)
                     * (${l2m("(c_a * tot_b)")} - ${l2m("(c_b * tot_a)")})
                     AS psi_term
            FROM cnt CROSS JOIN t"""
      }),

    // K-ANONYMITY audit (ext.) — the privacy-governance counterpart of
    // the PII redaction pass: every quasi-identifier combination
    // (segment × nation here) whose occupancy is below k = 5 is a
    // re-identification risk; a release gate needs the at-risk combos
    // AND the headline share of rows they cover. One hash-agg over the
    // QI tuple + one tiny rollup — group-cardinality work at any scale.
    Q("audit_k_anonymity",
      (s, d) => {
        val occ = Tables.customer(s, d)
          .withColumn("balance_band",
            floor(col("c_acctbal").cast("decimal(18,2)") / 2000)
              .cast("long"))
          .groupBy(col("c_mktsegment"), col("c_nationkey"),
            col("balance_band"))
          .agg(count(lit(1)).as("occupancy"))
        occ.filter(col("occupancy") < 5)
          .select(col("c_mktsegment"), col("c_nationkey"),
            col("balance_band"), col("occupancy"),
            lit("at_risk").as("verdict"))
      },
      Some("""SELECT c_mktsegment, c_nationkey,
                     CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / 2000)
                       AS BIGINT) AS balance_band,
                     count(*) AS occupancy, 'at_risk' AS verdict
              FROM customer
              GROUP BY 1, 2, 3 HAVING count(*) < 5""")),

    // OBSERVED metrics (ext.) — `Dataset.observe` piggybacks aggregate
    // metrics onto a pass the job was ALREADY making (here: writing the
    // screened slice), so the audit numbers a pipeline logs per stage
    // cost ZERO extra scans — the reference's log_filter counters, with
    // no second action. The observed values are surfaced as a one-row
    // relation and hash-gated against SQL recomputing them, so the
    // free-metrics path can never silently drift from the real ones.
    Q("audit_observe",
      (s, d) => {
        val obs = new org.apache.spark.sql.Observation()
        val screened = Tables.lineitem(s, d)
          .filter(col("l_quantity") <= 45)
          .observe(obs,
            count(lit(1)).as("n_rows"),
            Tables.dsum(col("l_extendedprice")).as("sum_price"),
            max(col("l_suppkey")).as("max_supplier"))
        val dir = graft.Scratch.dirFor("audit_observe", d)
        screened.write.mode("overwrite").parquet(s"$dir/screened")
        val m = obs.get
        import s.implicits._
        Seq((m("n_rows").asInstanceOf[Long],
            m("sum_price").asInstanceOf[Double],
            m("max_supplier").asInstanceOf[Long]))
          .toDF("n_rows", "sum_price", "max_supplier")
      },
      Some("""SELECT count(*) AS n_rows,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS sum_price,
                     max(l_suppkey) AS max_supplier
              FROM lineitem WHERE l_quantity <= 45"""))
  )
}
