package graft.queries

import graft.Tables
import graft.llmdata.TextOps
import org.apache.spark.sql.functions._

/** Sketch operators — the cardinality/frequency estimation layer a
  * 100 TB pipeline runs where exact counting is too expensive, built
  * ENGINE-EXACT: every sketch state is integers from the shared 60-bit
  * md5 hash family, so DuckDB reproduces the registers bit-for-bit and
  * the estimates are the same IEEE doubles (identical formula text over
  * identical integers). Each sketch ships next to its ground truth —
  * the estimate is never reported without its measured error.
  *
  * (No reference counterpart — the reference is a financial pipeline;
  * these are the LLM-data-scale extensions the brief calls for.)
  */
object QSketch extends Registry {

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val toksSql = s"string_split($normSql, ' ')"
  private val h60 = QDedup.h60

  /** HLL register table (register, max_rho) over any frame with a
    * `text` column — factored so the mergeability property (max per
    * register distributes over any corpus split) is testable against
    * the exact construction the query ships (`SketchSpec`).
    */
  private[queries] def hllRegisters(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct()
      .select(TextOps.hash60(col("tok")).as("h"))
      .select(pmod(col("h"), lit(256L)).as("register"),
        expr("h div 256").as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(53L))
          .otherwise(lit(53L) - length(conv(col("w"), 10, 2))))
      .groupBy(col("register"))
      .agg(max(col("rho")).as("max_rho"))

  /** CMS counter table (rw, col, counter) over any frame with a `text`
    * column — factored for the linearity property (counters add over
    * any corpus split, `SketchSpec`).
    */
  private[queries] def cmsCounters(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("hp", pmod(TextOps.hash60(col("tok")), lit(2147483647L)))
    val expanded = CmsRows.indices.map(i =>
      tf.select(lit(i).as("rw"), cmsCol(i).as("col"), col("cnt")))
      .reduce(_.unionByName(_))
    expanded.groupBy(col("rw"), col("col"))
      .agg(sum(col("cnt")).as("counter"))
  }

  private[queries] val CmsRows = Seq((40503L, 12345L), (48271L, 7919L),
    (69621L, 31337L), (16807L, 97531L))

  /** KMV (bottom-k) sketch rows (side, rk, h) over the distinct token
    * 3-gram hashes of each corpus half — factored so `KmvSpec` can pin
    * the two properties that make it a sketch: completeness below theta
    * (every distinct hash < the side's k-th smallest IS in the sketch)
    * and bottom-k mergeability (bottom-k of bottom-k unions == bottom-k
    * of the union). State per side is k longs carried by the same
    * k-bounded typed Aggregator as o6 (v = -h makes its value-DESC
    * order mean h-ASC), so partial aggregation ships ≤ k rows per task
    * whatever the corpus size — the tree-mergeable shape a
    * 1000-executor census needs.
    */
  private[queries] val KmvK = 256

  private[queries] def kmvSketch(
      docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame =
    kmvSketchFrom(kmvHashes(docs), k)

  private[queries] def kmvSketchFrom(
      hv: org.apache.spark.sql.DataFrame, k: Int, keyCol: String = "side")
      : org.apache.spark.sql.DataFrame = {
    val bk = udaf(new graft.operators.TopKByValue(k),
      org.apache.spark.sql.Encoders.product[graft.operators.TopKIn])
    hv.groupBy(col(keyCol))
      .agg(bk(-col("h"), col("h"), lit(0).cast("int")).as("tk"))
      .select(col(keyCol), posexplode(col("tk.items")))
      .select(col(keyCol), (col("pos") + 1).as("rk"), col("col.ok").as("h"))
  }

  /** Distinct (side, token-3-gram hash) universe the KMV sketch samples —
    * one in-row native gram hash + one hash-agg; gram STRINGS never
    * shuffle.
    */
  private[queries] def kmvHashes(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.llmdata.TextOps.gramHashes(docs, "doc_id", "text", 3)
      .select(pmod(col("id"), lit(2L)).as("side"), col("gh").as("h"))
      .distinct()

  private[queries] val PriK = 128
  private[queries] val MatrixK = 128
  private[queries] val MgK = 64

  /** Weighted documents ranked by deterministic priority (Duffield–
    * Lund–Thorup 2007): w = token count, u = (h+1)/2^60 from the shared
    * 60-bit hash of the doc_id, priority q = w/u — computed as ONE
    * double formula over integers so both engines land on the same IEEE
    * values. Factored for `PrioritySampleSpec` (inclusion theorem +
    * estimator grading). The top-(k+1) is `orderBy.limit` —
    * TakeOrderedAndProject, a k-bounded state per partition merged on
    * the driver, never a global sort.
    */
  private[queries] def priorityRanked(
      docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("w"))
      .withColumn("h", TextOps.hash60(col("doc_id").cast("string")))
      .withColumn("q",
        col("w").cast("double") * lit(1.152921504606846976e18)
          / (col("h").cast("double") + lit(1.0)))
    val top = base.orderBy(col("q").desc, col("doc_id").asc).limit(k + 1)
    // rank WITHIN the k+1-row result — sketch-sized, the global window
    // never sees the data relation
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id").asc)
    top.withColumn("rk", row_number().over(win))
  }

  /** Per-source subset-sum estimate + exact-truth ride-along from a
    * ranked top-(k+1) priority frame (doc_id, source, w, q, rk) —
    * shared by `sk_priority_sample` and its streaming face
    * `stream_priority_sample`, so the two assemblies cannot drift.
    * tau = the (k+1)-th priority; each kept item estimates its weight
    * as max(w, tau), quantized to integer micro-tokens BEFORE the sum
    * so the output is order-free integer arithmetic.
    */
  private[queries] def prioritySampleResult(
      docs: org.apache.spark.sql.DataFrame,
      ranked: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val tau = ranked.filter(col("rk") === k + 1)
      .select(col("q").as("tau"))
    val est = ranked.filter(col("rk") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("w_hat_micro",
        floor(greatest(col("w").cast("double"), col("tau"))
          * lit(1000000.0)).cast("bigint"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("w_hat_micro")).as("est_tokens_micro"))
    val truth = docs.select(col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("w"))
      .groupBy(col("source")).agg(sum(col("w")).as("true_tokens"))
    truth.join(est, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("est_tokens_micro"), lit(0L)).as("est_tokens_micro"),
        col("true_tokens"))
  }

  /** The batch construction in DuckDB — also the oracle of the
    * streaming face (the merged per-batch sample equals the batch
    * sample EXACTLY; see `stream_priority_sample`).
    */
  private[queries] def prioritySampleOracle: String =
    s"""WITH w AS (
          SELECT doc_id, source,
                 CAST(len(string_split($normSql, ' ')) AS BIGINT) AS w,
                 ${h60("CAST(doc_id AS VARCHAR)")} AS h
          FROM documents),
        pq AS (
          SELECT doc_id, source, w,
                 CAST(w AS DOUBLE) * 1152921504606846976e0
                   / (CAST(h AS DOUBLE) + 1e0) AS q
          FROM w),
        ranked AS (
          SELECT doc_id, source, w, q,
                 row_number() OVER (ORDER BY q DESC, doc_id) AS rk
          FROM pq),
        tau AS (SELECT q AS tau FROM ranked WHERE rk = ${PriK + 1}),
        est AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
                 CAST(sum(CAST(floor(greatest(CAST(w AS DOUBLE), tau)
                     * 1000000e0) AS BIGINT)) AS BIGINT)
                   AS est_tokens_micro
          FROM ranked, tau WHERE rk <= $PriK GROUP BY 1),
        truth AS (
          SELECT source, CAST(sum(w) AS BIGINT) AS true_tokens
          FROM w GROUP BY 1)
        SELECT t.source,
               coalesce(e.n_sampled, 0) AS n_sampled,
               coalesce(e.est_tokens_micro, 0) AS est_tokens_micro,
               t.true_tokens
        FROM truth t LEFT JOIN est e USING (source)"""

  /** j20's hot shape over a huge key domain: 8 hot keys carry half the
    * stream, the rest are once-seen tail keys (~n/2 distinct) — shared
    * by `sk_mg_heavyhitters` and `stream_mg_census` so the two faces
    * key identically.
    */
  private[queries] def mgKeyCol: org.apache.spark.sql.Column =
    when((col("l_orderkey") + col("l_linenumber")) % 2 === 0,
      concat(lit("hot-"), (col("l_orderkey") % 8).cast("string")))
      .otherwise(concat(lit("u-"),
        col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")))

  private[queries] def mgKeyed(
      li: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    li.select(mgKeyCol.as("k"))

  private[queries] val mgKeySql: String =
    """CASE WHEN (l_orderkey + l_linenumber) % 2 = 0
            THEN 'hot-' || CAST(l_orderkey % 8 AS VARCHAR)
            ELSE 'u-' || CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR) END"""

  /** one (row count, ≤k-entry MG summary) per partition. */
  private[queries] def mgPartials(
      keyed: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.Dataset[(Long, Seq[(String, Long)])] =
    keyed.as(org.apache.spark.sql.Encoders.STRING)
      .mapPartitions(it => Iterator.single(
        graft.operators.MisraGries.sketch(it, k) match {
          case (n, m) => (n, m.toSeq)
        }))(org.apache.spark.sql.Encoders.product[(Long, Seq[(String, Long)])])

  /** exact recount of the candidate keys, thresholded cnt·(k+1) > n —
    * the pass-2 assembly shared by both MG faces. */
  private[queries] def mgRecount(
      keyed: org.apache.spark.sql.DataFrame, candidates: Seq[String],
      n: Long, k: Int): org.apache.spark.sql.DataFrame =
    keyed.filter(col("k").isin(candidates: _*))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > lit(n))
      .select(col("k"), col("cnt"))

  /** the MG oracle — plain GROUP BY + HAVING (shared by both faces). */
  private[queries] def mgOracle: String =
    s"""WITH st AS (
          SELECT CASE WHEN (l_orderkey + l_linenumber) % 2 = 0
                      THEN 'hot-' || CAST(l_orderkey % 8 AS VARCHAR)
                      ELSE 'u-' || CAST(l_orderkey AS VARCHAR) || '-'
                           || CAST(l_linenumber AS VARCHAR) END AS k
          FROM lineitem),
        tf AS (SELECT k, CAST(count(*) AS BIGINT) AS cnt
               FROM st GROUP BY k),
        n AS (SELECT count(*) AS n FROM st)
        SELECT k, cnt FROM tf, n WHERE cnt * ${MgK + 1} > n"""

  private[queries] def cmsCol(i: Int): org.apache.spark.sql.Column = {
    val (a, b) = CmsRows(i)
    pmod(pmod(col("hp") * a + b, lit(2147483647L)), lit(1024L))
  }

  def qs: Seq[Q] = Seq(

    // HyperLogLog register table over the corpus VOCABULARY (distinct
    // tokens): m=256 registers, register = h mod 256, rho = leading-zero
    // rank of the remaining 52 bits (via binary-string length — integer
    // ops only, no transcendentals). The register table IS the sketch
    // state a distributed run would merge (max per register is
    // associative/commutative — partial-aggregable on any tree), and at
    // 256 rows it broadcasts anywhere. Scale shape: one hash-agg over
    // (register) after an in-row hash — the token strings never shuffle
    // beyond the distinct.
    Q("sk_hll_registers",
      (s, d) => hllRegisters(Tables.documents(s, d)),
      Some(s"""WITH tok AS (
                SELECT DISTINCT unnest($toksSql) AS tok FROM documents),
              hashed AS (SELECT ${h60("tok")} AS h FROM tok),
              reg AS (SELECT h % 256 AS register, h // 256 AS w FROM hashed)
              SELECT register,
                     max(CASE WHEN w = 0 THEN 53
                              ELSE 53 - length(bin(w)) END) AS max_rho
              FROM reg GROUP BY 1""")),

    // The HLL ESTIMATE next to exact truth: S = Σ 2^(53−rho) keeps the
    // harmonic sum an exact BIGINT (2^−rho = 2^(53−rho)/2^53), and the
    // final alpha·m²·2^53/S is the same IEEE double in both engines
    // (identical operation order over identical integers). Ships
    // est / true / S in one row — the sketch is graded, not trusted.
    Q("sk_hll_estimate",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .distinct()
        val regs = toks
          .select(TextOps.hash60(col("tok")).as("h"))
          .select(pmod(col("h"), lit(256L)).as("register"),
            expr("h div 256").as("w"))
          .withColumn("rho",
            when(col("w") === 0L, lit(53L))
              .otherwise(lit(53L) - length(conv(col("w"), 10, 2))))
          .groupBy(col("register")).agg(max(col("rho")).as("max_rho"))
        // EMPTY registers contribute 2^-0 = 1 each to the harmonic sum
        // (2^53 in scaled units) — the standard estimator. At oracle
        // scale the synthetic vocabulary is SMALL (most registers
        // empty), which is HLL's known-biased small range: m_hit is
        // shipped precisely so the regime is visible next to the raw
        // estimate (the linear-counting branch needs ln(), which is not
        // cross-engine ulp-stable — a production caller applies it
        // driver-side from m_hit, outside the hash-compared result).
        val est = regs.agg(
          count(lit(1)).as("m_hit"),
          sum(expr("shiftleft(cast(1 as bigint), cast(53 - max_rho as int))"))
            .as("s_hit"))
          .select(col("m_hit"),
            (col("s_hit") + (lit(256L) - col("m_hit")) * lit(9007199254740992L))
              .as("s_sum"))
        val truth = toks.agg(count(lit(1)).as("true_distinct"))
        est.crossJoin(truth)
          .select(col("m_hit"), col("s_sum"), col("true_distinct"),
            (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
              * lit(9007199254740992.0) / col("s_sum").cast("double"))
              .as("est_distinct"))
      },
      Some(s"""WITH tok AS (
                SELECT DISTINCT unnest($toksSql) AS tok FROM documents),
              hashed AS (SELECT ${h60("tok")} AS h FROM tok),
              reg AS (SELECT h % 256 AS register, h // 256 AS w FROM hashed),
              regs AS (SELECT register,
                         max(CASE WHEN w = 0 THEN 53
                                  ELSE 53 - length(bin(w)) END) AS max_rho
                       FROM reg GROUP BY 1)
              , agg AS (
                SELECT CAST(count(*) AS BIGINT) AS m_hit,
                       CAST(sum(CAST(1 AS BIGINT) << CAST(53 - max_rho AS INT))
                         + (256 - count(*)) * 9007199254740992 AS BIGINT) AS s_sum
                FROM regs)
              SELECT m_hit, s_sum,
                     (SELECT CAST(count(*) AS BIGINT) FROM tok) AS true_distinct,
                     0.7213e0 / (1e0 + 1.079e0 / 256e0) * 65536e0
                       * 9007199254740992e0
                       / CAST(s_sum AS DOUBLE) AS est_distinct
              FROM agg""")),

    // Count-Min heavy-hitter calibration: a 4×1024 CMS over token
    // OCCURRENCES (counters = exact BIGINTs; the 4 row-hashes are
    // affine mixes of the shared 60-bit hash mod p), probed with the
    // corpus's true top-20 tokens — est = min over rows, always ≥ true,
    // the overshoot measuring collision pressure at this width. Scale
    // shape: ONE (token) hash-agg builds tf, the 4×1024 counter table
    // aggregates the 4-way expansion of tf (token strings never in the
    // sketch), and the probe joins the broadcast counter table.
    Q("sk_cms_heavyhitters",
      (s, d) => {
        val tf = graft.Caches.registerTransient(
          Tables.documents(s, d)
            .select(explode(TextOps.tokens(col("text"))).as("tok"))
            .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
            .withColumn("hp", pmod(TextOps.hash60(col("tok")), lit(2147483647L)))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val counters = cmsCounters(Tables.documents(s, d))
        val top = tf.orderBy(col("cnt").desc, col("tok").asc).limit(20)
        val probes = CmsRows.indices.map(i =>
          top.select(col("tok"), col("cnt"), lit(i).as("rw"),
            cmsCol(i).as("col")))
          .reduce(_.unionByName(_))
        probes.join(broadcast(counters), Seq("rw", "col"))
          .groupBy(col("tok"))
          .agg(max(col("cnt")).as("true_cnt"),
            min(col("counter")).as("est_cnt"))
          .select(col("tok"), col("true_cnt"), col("est_cnt"),
            (col("est_cnt") - col("true_cnt")).as("overcount"))
      },
      sketchHeavyHittersOracle),

    // Grouped HLL: one 256-register sketch PER SOURCE, estimate next to
    // exact truth per source. This is the shape a 100 TB corpus census
    // actually runs — "distinct vocabulary per source/domain/shard" —
    // and the register table is partial-aggregable on BOTH keys (max per
    // (source, register) distributes over any corpus split), so the
    // map-side combine ships at most |sources|·256 rows per task no
    // matter the input size. The exact truth column is the
    // distinct-counting pass the sketch replaces at scale; at oracle
    // scale it rides along to grade the estimate.
    Q("sk_hll_grouped",
      (s, d) => {
        val toks = graft.Caches.registerTransient(
          Tables.documents(s, d)
            .select(col("source"),
              explode(TextOps.tokens(col("text"))).as("tok"))
            .distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val regs = toks
          .select(col("source"), TextOps.hash60(col("tok")).as("h"))
          .select(col("source"), pmod(col("h"), lit(256L)).as("register"),
            expr("h div 256").as("w"))
          .withColumn("rho",
            when(col("w") === 0L, lit(53L))
              .otherwise(lit(53L) - length(conv(col("w"), 10, 2))))
          .groupBy(col("source"), col("register"))
          .agg(max(col("rho")).as("max_rho"))
        val est = regs.groupBy(col("source")).agg(
          count(lit(1)).as("m_hit"),
          sum(expr("shiftleft(cast(1 as bigint), cast(53 - max_rho as int))"))
            .as("s_hit"))
          .select(col("source"), col("m_hit"),
            (col("s_hit") + (lit(256L) - col("m_hit")) * lit(9007199254740992L))
              .as("s_sum"))
        val truth = toks.groupBy(col("source"))
          .agg(count(lit(1)).as("true_distinct"))
        est.join(truth, Seq("source"))
          .select(col("source"), col("m_hit"), col("s_sum"),
            col("true_distinct"),
            (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
              * lit(9007199254740992.0) / col("s_sum").cast("double"))
              .as("est_distinct"))
      },
      Some(s"""WITH tok AS (
                SELECT DISTINCT source, unnest($toksSql) AS tok
                FROM documents),
              reg AS (SELECT source, ${h60("tok")} % 256 AS register,
                             ${h60("tok")} // 256 AS w
                      FROM tok),
              regs AS (SELECT source, register,
                         max(CASE WHEN w = 0 THEN 53
                                  ELSE 53 - length(bin(w)) END) AS max_rho
                       FROM reg GROUP BY 1, 2),
              agg AS (
                SELECT source, CAST(count(*) AS BIGINT) AS m_hit,
                       CAST(sum(CAST(1 AS BIGINT) << CAST(53 - max_rho AS INT))
                         + (256 - count(*)) * 9007199254740992 AS BIGINT)
                         AS s_sum
                FROM regs GROUP BY 1),
              truth AS (SELECT source, CAST(count(*) AS BIGINT)
                          AS true_distinct
                        FROM tok GROUP BY 1)
              SELECT a.source, a.m_hit, a.s_sum, t.true_distinct,
                     0.7213e0 / (1e0 + 1.079e0 / 256e0) * 65536e0
                       * 9007199254740992e0
                       / CAST(a.s_sum AS DOUBLE) AS est_distinct
              FROM agg a JOIN truth t USING (source)""")),

    // CMS join-size estimation (the AMS/Count-Min inner-product bound,
    // Cormode & Muthukrishnan 2005 §4.2): before a planner picks
    // broadcast vs shuffle vs skew-salting for a token-level join, it
    // wants |A ⋈ B| WITHOUT running the join. Est_rw = Σ_col
    // cmsA[rw,c]·cmsB[rw,c] never underestimates (every true pair lands
    // in some shared cell; collisions only add), and min over the 4 rows
    // is the estimator. Ships all 4 per-row estimates next to the exact
    // join size — the collision inflation at 1024 columns is measured,
    // not hidden. Scale: the two counter tables are ≤4×1024 rows each
    // regardless of corpus size (broadcast-joined here), and each is one
    // hash-agg over its half's token frequencies — the token STRINGS
    // never cross the network.
    Q("sk_cms_joinsize",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val aHalf = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        val bHalf = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        def tf(df: org.apache.spark.sql.DataFrame) = df
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val exact = tf(aHalf).select(col("tok"), col("cnt").as("cnt_a"))
          .join(tf(bHalf).select(col("tok"), col("cnt").as("cnt_b")),
            Seq("tok"))
          .agg(sum(col("cnt_a") * col("cnt_b")).as("true_size"))
        val cb = cmsCounters(bHalf)
          .withColumnRenamed("counter", "counter_b")
        cmsCounters(aHalf)
          .join(broadcast(cb), Seq("rw", "col"))
          .groupBy(col("rw"))
          .agg(sum(col("counter") * col("counter_b")).as("est_size"))
          .join(broadcast(exact))
          .select(col("rw"), col("est_size"), col("true_size"),
            (col("est_size") - col("true_size")).as("overcount"))
      },
      Some {
        def half(tag: String, pred: String) =
          s"""occ_$tag AS (SELECT unnest($toksSql) AS tok
                           FROM documents WHERE $pred),
              tf_$tag AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
                            ${h60("tok")} % 2147483647 AS hp
                          FROM occ_$tag GROUP BY 1),
              expanded_$tag AS (
                ${CmsRows.indices.map(i =>
                  s"SELECT $i AS rw, ${cmsColSql(i)} AS col, cnt FROM tf_$tag")
                  .mkString("\n                UNION ALL ")}),
              counters_$tag AS (
                SELECT rw, col, CAST(sum(cnt) AS BIGINT) AS counter
                FROM expanded_$tag GROUP BY 1, 2)"""
        s"""WITH ${half("a", "doc_id % 2 = 0")},
            ${half("b", "doc_id % 2 = 1")},
            exact AS (
              SELECT CAST(sum(a.cnt * b.cnt) AS BIGINT) AS true_size
              FROM tf_a a JOIN tf_b b USING (tok)),
            est AS (
              SELECT a.rw, CAST(sum(a.counter * b.counter) AS BIGINT)
                       AS est_size
              FROM counters_a a JOIN counters_b b USING (rw, col)
              GROUP BY 1)
            SELECT rw, est_size, true_size, est_size - true_size AS overcount
            FROM est CROSS JOIN exact"""
      }),

    // Log-bucket quantile sketch (DDSketch-flavored): the mergeable
    // quantile structure a 100 TB pipeline keeps where an exact
    // quantile needs a global sort/rank. State = (bucket, count) with
    // bucket = log2milli(value) div 125 — integer milli-bit log2, so
    // the bucket RELATIVE-error contract (value known to within one
    // 0.125-bit band, ≈ 9%) is engine-exact and the table merges by
    // counter ADDITION (map-side combine IS the merge; same linearity
    // as the CMS census). The probe walks the ≤ a-few-hundred-row
    // cumulative table — metadata-scale, whatever the input size — and
    // every estimate ships NEXT TO the exact rank value (a15's
    // PrefixSum machinery), with the error measured in milli-bits:
    // err_mb ∈ [0, 125) by construction (`SketchSpec`).
    Q("sk_qsketch_quantiles",
      (s, d) => {
        import s.implicits._
        val cents = Tables.orders(s, d).select(
          col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint").as("c"))
        val sketch = cents
          .select(expr("log2milli(c) div 125").as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        // cumulative walk over the TINY bucket table (sketch-, not
        // data-sized — a SinglePartition window here is the point)
        val wc = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val tot = sketch.agg(sum(col("cnt")).as("n_rows"))
        val qDf = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
          .toDF("q_label", "q_num", "q_den")
        val target = expr("(q_num * n_rows + q_den - 1) div q_den")
        val probe = sketch.withColumn("cum", sum(col("cnt")).over(wc))
          .crossJoin(broadcast(tot)).crossJoin(broadcast(qDf))
          .filter(col("cum") >= target && col("cum") - col("cnt") < target)
          .select(col("q_label"), target.as("target_rank"), col("bucket"),
            (col("bucket") * 125).as("lo_mb"),
            (col("bucket") * 125 + 125).as("hi_mb"))
        val ranked = graft.operators.PrefixSum.withRunningSumAndRank(
          cents,
          order = Seq(col("c").asc, col("o_orderkey").asc),
          valueCol = lit(0L),
          outCol = "cum0", rankCol = "rk",
          persistInput = false,
          grandTotals = Some(("z0", "n_rows")))
        val exact = ranked.join(broadcast(qDf), col("rk") === target)
          .select(col("q_label"), col("c").as("exact_cents"))
        probe.join(exact, Seq("q_label"))
          .withColumn("exact_mb", call_function("log2milli", col("exact_cents")))
          .withColumn("err_mb", col("exact_mb") - col("lo_mb"))
      },
      Some {
        val l2m = QText.l2mSql
        s"""WITH cents AS (
              SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS c
              FROM orders),
            sk AS (
              SELECT ${l2m("c")} // 125 AS bucket,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM cents GROUP BY 1),
            cum AS (
              SELECT bucket, cnt,
                     sum(cnt) OVER (ORDER BY bucket
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM sk),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows FROM sk),
            qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                     ('p99', 99, 100)) q(q_label, q_num, q_den)),
            probe AS (
              SELECT q_label,
                     CAST((q_num * n_rows + q_den - 1) // q_den AS BIGINT)
                       AS target_rank,
                     bucket, bucket * 125 AS lo_mb,
                     bucket * 125 + 125 AS hi_mb
              FROM cum CROSS JOIN tot CROSS JOIN qs
              WHERE cum >= (q_num * n_rows + q_den - 1) // q_den
                AND cum - cnt < (q_num * n_rows + q_den - 1) // q_den),
            ranked AS (
              SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rk
              FROM cents)
            SELECT p.q_label, p.target_rank, p.bucket, p.lo_mb, p.hi_mb,
                   r.c AS exact_cents,
                   ${l2m("r.c")} AS exact_mb,
                   ${l2m("r.c")} - p.lo_mb AS err_mb
            FROM probe p JOIN ranked r ON r.rk = p.target_rank"""
      }),

    // KMV / theta-sketch corpus OVERLAP: "how much of corpus B is
    // already in corpus A?" asked sketch-side, the question a 100 TB
    // ingest answers BEFORE paying for an exact anti-join (new-crawl vs
    // holdings, source-vs-source redundancy pricing). Universe = distinct
    // token 3-grams per half (doc_id parity); each side keeps its k=256
    // smallest 60-bit hashes (the same k-bounded mergeable Aggregator as
    // o6 — sketch state is 256 longs, map-side combinable on any tree).
    // theta_s = the side's k-th smallest; below theta_min BOTH sketches
    // are EXACT p-samples of their universes (p = theta_min/2^60), so
    // |union∩[0,theta_min)| / p and |both∩[0,theta_min)| / p estimate
    // union and intersection distinct counts — one double formula over
    // integer state, identical text both engines. Exact truth rides
    // along: the estimate is graded, never trusted. Scale shape: one
    // in-row gram hash + one (side, h) hash-agg + the k-bounded agg;
    // everything downstream is 2k rows = metadata.
    Q("sk_kmv_overlap",
      (s, d) => {
        val k = KmvK
        val hv = graft.Caches.registerTransient(
          kmvHashes(Tables.documents(s, d))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val sk = graft.Caches.registerTransient(
          kmvSketchFrom(hv, k)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val thetas = sk.agg(
          max(when(col("side") === 0 && col("rk") === k, col("h")))
            .as("theta_a"),
          max(when(col("side") === 1 && col("rk") === k, col("h")))
            .as("theta_b"))
          .withColumn("theta_min", least(col("theta_a"), col("theta_b")))
        val below = sk.crossJoin(broadcast(thetas))
          .filter(col("h") < col("theta_min"))
        val u = below.agg(countDistinct(col("h")).as("n_union_sample"))
        val i = below.groupBy(col("h"))
          .agg(countDistinct(col("side")).as("ns"))
          .filter(col("ns") === 2)
          .agg(count(lit(1)).as("n_inter_sample"))
        val tu = hv.agg(countDistinct(col("h")).as("true_union"))
        val ti = hv.groupBy(col("h"))
          .agg(countDistinct(col("side")).as("ns"))
          .filter(col("ns") === 2)
          .agg(count(lit(1)).as("true_inter"))
        thetas.crossJoin(broadcast(u)).crossJoin(broadcast(i))
          .crossJoin(broadcast(tu)).crossJoin(broadcast(ti))
          .select(lit(k).as("k"), col("theta_a"), col("theta_b"),
            col("n_union_sample"), col("n_inter_sample"),
            col("true_union"), col("true_inter"),
            (col("n_union_sample").cast("double")
              * lit(1.152921504606846976e18)
              / col("theta_min").cast("double")).as("est_union"),
            (col("n_inter_sample").cast("double")
              * lit(1.152921504606846976e18)
              / col("theta_min").cast("double")).as("est_inter"))
      },
      Some(s"""WITH $kmvSketchCtes,
              thetas AS (
                SELECT max(CASE WHEN side = 0 AND rk = $KmvK THEN h END)
                         AS theta_a,
                       max(CASE WHEN side = 1 AND rk = $KmvK THEN h END)
                         AS theta_b
                FROM sk),
              tmin AS (SELECT theta_a, theta_b,
                              least(theta_a, theta_b) AS theta_min
                       FROM thetas),
              usample AS (
                SELECT CAST(count(DISTINCT s.h) AS BIGINT) AS n_union_sample
                FROM sk s, tmin t WHERE s.h < t.theta_min),
              isample AS (
                SELECT CAST(count(*) AS BIGINT) AS n_inter_sample
                FROM (SELECT s.h FROM sk s, tmin t
                      WHERE s.h < t.theta_min
                      GROUP BY s.h HAVING count(DISTINCT s.side) = 2)),
              truth_u AS (
                SELECT CAST(count(DISTINCT h) AS BIGINT) AS true_union
                FROM hv),
              truth_i AS (
                SELECT CAST(count(*) AS BIGINT) AS true_inter
                FROM (SELECT h FROM hv
                      GROUP BY h HAVING count(DISTINCT side) = 2))
              SELECT CAST($KmvK AS INT) AS k, theta_a, theta_b,
                     n_union_sample, n_inter_sample, true_union, true_inter,
                     CAST(n_union_sample AS DOUBLE) * 1152921504606846976e0
                       / CAST(theta_min AS DOUBLE) AS est_union,
                     CAST(n_inter_sample AS DOUBLE) * 1152921504606846976e0
                       / CAST(theta_min AS DOUBLE) AS est_inter
              FROM tmin, usample, isample, truth_u, truth_i""")),

    // Priority sampling (Duffield–Lund–Thorup 2007): the ONE weighted
    // sample of k documents that answers ANY later subset-sum question
    // ("how many tokens does source X contribute?") with a known-good
    // estimator — the summary a 100 TB pipeline keeps when it cannot
    // know the queries in advance. Deterministic: u_i = (h_i+1)/2^60
    // from the shared 60-bit doc_id hash, priority q_i = w_i/u_i, keep
    // the k largest priorities, tau = the (k+1)-th; each kept item
    // estimates its weight as max(w_i, tau) (w_i > tau guarantees
    // inclusion — the spec pins the theorem). Estimates are quantized
    // to integer micro-tokens BEFORE the per-source sum so the output
    // is order-free integer arithmetic, and every source ships its
    // exact token total next to the estimate. Scale shape: one in-row
    // hash+formula, one TakeOrderedAndProject (k+1-bounded state per
    // partition, merged once), one hash-agg for truth.
    Q("sk_priority_sample",
      (s, d) => prioritySampleResult(Tables.documents(s, d),
        priorityRanked(Tables.documents(s, d), PriK), PriK),
      Some(prioritySampleOracle)),

    // The KMV OVERLAP MATRIX: sketch each source ONCE (bottom-k=128
    // over its distinct token-3-gram hashes), then answer ALL
    // C(20,2)=190 pairwise overlap questions from the sketch table
    // alone — the source-vs-source redundancy pricing a curation team
    // wants BEFORE deciding which crawls to keep, priced at one
    // sketch pass instead of 190 distinct-intersection joins. Below
    // each pair's theta_min = min(theta_a, theta_b) both sketches are
    // exact p-samples, so shared-hash counts scale to intersection
    // estimates by 2^60/theta_min. Every pair ships its EXACT
    // intersection too (the n² pass the sketch replaces — affordable
    // at oracle scale, the grade at any scale a sample ride-along).
    // Scale shape: the sketch table is |sources|·k rows = metadata —
    // the pairwise stage never touches the data relation; only the
    // truth column costs a gram-level self-join, and it leaves with
    // the sketch's error measured, not assumed.
    Q("sk_kmv_matrix",
      (s, d) => {
        val k = MatrixK
        val docs = Tables.documents(s, d)
        val hv = graft.Caches.registerTransient(
          TextOps.gramHashes(docs, "source", "text", 3)
            .select(col("id").as("source"), col("gh").as("h"))
            .distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val sk = graft.Caches.registerTransient(
          kmvSketchFrom(hv, k, keyCol = "source")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val thetas = sk.filter(col("rk") === k)
          .select(col("source"), col("h").as("theta"))
        val allPairs = thetas.select(col("source").as("src_a"),
            col("theta").as("theta_a"))
          .crossJoin(thetas.select(col("source").as("src_b"),
            col("theta").as("theta_b")))
          .filter(col("src_a") < col("src_b"))
          .withColumn("theta_min", least(col("theta_a"), col("theta_b")))
        val shared = sk.as("a")
          .join(sk.as("b"),
            col("a.h") === col("b.h") && col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
            col("a.h").as("h"))
        val nInter = shared
          .join(broadcast(allPairs.select(col("src_a"), col("src_b"),
            col("theta_min"))), Seq("src_a", "src_b"))
          .filter(col("h") < col("theta_min"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_inter_sample"))
        val truth = hv.as("a")
          .join(hv.as("b"),
            col("a.h") === col("b.h") && col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("true_inter"))
        allPairs
          .join(nInter, Seq("src_a", "src_b"), "left")
          .join(truth, Seq("src_a", "src_b"), "left")
          .select(col("src_a"), col("src_b"),
            coalesce(col("n_inter_sample"), lit(0L)).as("n_inter_sample"),
            coalesce(col("true_inter"), lit(0L)).as("true_inter"),
            (coalesce(col("n_inter_sample"), lit(0L)).cast("double")
              * lit(1.152921504606846976e18)
              / col("theta_min").cast("double")).as("est_inter"))
      },
      Some(s"""WITH norm AS (
                SELECT source, string_split($normSql, ' ') AS toks
                FROM documents),
              npos AS (
                SELECT source, toks,
                       unnest(generate_series(1, len(toks) - 2)) AS i
                FROM norm WHERE len(toks) >= 3),
              hv AS (
                SELECT DISTINCT source,
                       ${h60("array_to_string(list_slice(toks, i, i + 2), ' ')")} AS h
                FROM npos),
              rkc AS (
                SELECT source, h,
                       row_number() OVER (PARTITION BY source ORDER BY h)
                         AS rk
                FROM hv),
              sk AS (SELECT source, h, rk FROM rkc WHERE rk <= $MatrixK),
              thetas AS (SELECT source, h AS theta FROM sk
                         WHERE rk = $MatrixK),
              allpairs AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       least(a.theta, b.theta) AS theta_min
                FROM thetas a JOIN thetas b ON a.source < b.source),
              ninter AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       CAST(count(*) AS BIGINT) AS n_inter_sample
                FROM sk a
                JOIN sk b ON a.h = b.h AND a.source < b.source
                JOIN allpairs p
                  ON p.src_a = a.source AND p.src_b = b.source
                WHERE a.h < p.theta_min
                GROUP BY 1, 2),
              truth AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       CAST(count(*) AS BIGINT) AS true_inter
                FROM hv a JOIN hv b ON a.h = b.h AND a.source < b.source
                GROUP BY 1, 2)
              SELECT p.src_a, p.src_b,
                     coalesce(n.n_inter_sample, 0) AS n_inter_sample,
                     coalesce(t.true_inter, 0) AS true_inter,
                     CAST(coalesce(n.n_inter_sample, 0) AS DOUBLE)
                       * 1152921504606846976e0
                       / CAST(p.theta_min AS DOUBLE) AS est_inter
              FROM allpairs p
              LEFT JOIN ninter n
                ON n.src_a = p.src_a AND n.src_b = p.src_b
              LEFT JOIN truth t
                ON t.src_a = p.src_a AND t.src_b = p.src_b""")),

    // NATIVE bottom-k aggregate (ext.) — the KMV primitive as a
    // Catalyst TypedImperativeAggregate (`expressions.BottomK`, SQL
    // `bottomk(h, k)`): the (b) custom-operator tier for AGGREGATION,
    // completing the ladder next to the scalar native expressions and
    // the j28 whole-operator tier. Spark plans the two-phase
    // ObjectHashAggregate — per-task k-long max-heaps (O(log k)/row),
    // partial buffers serialize as k packed longs, merge folds heaps —
    // so the shuffle carries ≤ k longs per (task, side) whatever the
    // corpus. The sketch it builds is value-identical to the typed
    // Aggregator formulation the other KMV rows ship (`BottomKSpec`
    // pins it, plus partition invariance and the planned shape); the
    // oracle is the same sketch CTE chain.
    Q("sk_kmv_native",
      (s, d) => {
        graft.GraftExtensions.ensure(s)
        kmvHashes(Tables.documents(s, d))
          .groupBy(col("side"))
          .agg(expr(s"bottomk(h, $KmvK)").as("hs"))
          .select(col("side"), posexplode(col("hs")))
          .select(col("side"), (col("pos") + 1).cast("int").as("rk"),
            col("col").as("h"))
      },
      Some(s"""WITH $kmvSketchCtes
              SELECT side, CAST(rk AS INT) AS rk, h FROM sk""")),

    // KMV A-NOT-B (ext.) — the set-DIFFERENCE face of the theta
    // sketch (Apache DataSketches' AnotB, the third member of the
    // union/intersection algebra sk_kmv_overlap ships): "how much of
    // the new crawl is NOT already in holdings?" — the incremental-
    // ingest sizing question, answered sketch-side. Below theta_min
    // both sides are exact p-samples, so a sampled hash < theta_min is
    // in B iff it is in B's sketch — membership is decidable INSIDE the
    // sample, and |A\B| ≈ #(a-hashes < theta_min not in b) / p. Both
    // directions ship with their exact truths (the anti-join the sketch
    // replaces). Scale shape: identical to sk_kmv_overlap — everything
    // past the k-bounded sketch is 2k rows of metadata.
    Q("sk_kmv_anotb",
      (s, d) => {
        val k = KmvK
        val hv = graft.Caches.registerTransient(
          kmvHashes(Tables.documents(s, d))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val sk = graft.Caches.registerTransient(
          kmvSketchFrom(hv, k)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val thetas = sk.agg(
          max(when(col("side") === 0 && col("rk") === k, col("h")))
            .as("theta_a"),
          max(when(col("side") === 1 && col("rk") === k, col("h")))
            .as("theta_b"))
          .withColumn("theta_min", least(col("theta_a"), col("theta_b")))
        def diffCounts(src: org.apache.spark.sql.DataFrame,
            aCol: String, bCol: String) = src
          .groupBy(col("h"))
          .agg(max(when(col("side") === 0, 1).otherwise(0)).as("in_a"),
            max(when(col("side") === 1, 1).otherwise(0)).as("in_b"))
          .agg(
            sum(when(col("in_a") === 1 && col("in_b") === 0, 1L)
              .otherwise(0L)).as(aCol),
            sum(when(col("in_b") === 1 && col("in_a") === 0, 1L)
              .otherwise(0L)).as(bCol))
        val sample = diffCounts(
          sk.crossJoin(broadcast(thetas)).filter(col("h") < col("theta_min")),
          "n_anotb_sample", "n_bnota_sample")
        val truth = diffCounts(hv, "true_anotb", "true_bnota")
        thetas.crossJoin(broadcast(sample)).crossJoin(broadcast(truth))
          .select(lit(k).as("k"), col("theta_a"), col("theta_b"),
            col("n_anotb_sample"), col("n_bnota_sample"),
            col("true_anotb"), col("true_bnota"),
            (col("n_anotb_sample").cast("double")
              * lit(1.152921504606846976e18)
              / col("theta_min").cast("double")).as("est_anotb"),
            (col("n_bnota_sample").cast("double")
              * lit(1.152921504606846976e18)
              / col("theta_min").cast("double")).as("est_bnota"))
      },
      Some(s"""WITH $kmvSketchCtes,
              thetas AS (
                SELECT max(CASE WHEN side = 0 AND rk = $KmvK THEN h END)
                         AS theta_a,
                       max(CASE WHEN side = 1 AND rk = $KmvK THEN h END)
                         AS theta_b
                FROM sk),
              tmin AS (SELECT theta_a, theta_b,
                              least(theta_a, theta_b) AS theta_min
                       FROM thetas),
              smarks AS (
                SELECT s.h,
                       max(CASE WHEN s.side = 0 THEN 1 ELSE 0 END) AS in_a,
                       max(CASE WHEN s.side = 1 THEN 1 ELSE 0 END) AS in_b
                FROM sk s, tmin t WHERE s.h < t.theta_min GROUP BY s.h),
              sample AS (
                SELECT CAST(sum(CASE WHEN in_a = 1 AND in_b = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anotb_sample,
                       CAST(sum(CASE WHEN in_b = 1 AND in_a = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bnota_sample
                FROM smarks),
              tmarks AS (
                SELECT h,
                       max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_a,
                       max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_b
                FROM hv GROUP BY h),
              truth AS (
                SELECT CAST(sum(CASE WHEN in_a = 1 AND in_b = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS true_anotb,
                       CAST(sum(CASE WHEN in_b = 1 AND in_a = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS true_bnota
                FROM tmarks)
              SELECT CAST($KmvK AS INT) AS k, theta_a, theta_b,
                     n_anotb_sample, n_bnota_sample,
                     true_anotb, true_bnota,
                     CAST(n_anotb_sample AS DOUBLE) * 1152921504606846976e0
                       / CAST(theta_min AS DOUBLE) AS est_anotb,
                     CAST(n_bnota_sample AS DOUBLE) * 1152921504606846976e0
                       / CAST(theta_min AS DOUBLE) AS est_bnota
              FROM tmin, sample, truth""")),

    // Misra–Gries EXACT heavy hitters in two passes (ext.) — the
    // frequency question the CMS can't answer: CMS needs the heavy keys
    // NAMED to probe them, MG DISCOVERS them. The stream is j20's hot
    // shape over a HUGE key domain: half the rows concentrate on 8 hot
    // keys, the other half are once-seen long-tail keys (~n/2 distinct
    // — the regime where groupBy(key) shuffles a key domain as big as
    // the data). Pass 1: one ≤k-entry MG summary PER PARTITION (the
    // superset-of-heavy guarantee: any key with count > n/(k+1)
    // survives every partition sketch AND the mergeable-summaries
    // fold, `MisraGriesSpec`), driver-merged at ≤ partitions·k entries
    // — metadata, the PrefixSum collect class. Pass 2: exact recount of
    // the ≤k candidates behind an isin pushdown, thresholded at
    // cnt·(k+1) > n. The OUTPUT is the exact heavy set — deterministic
    // regardless of partitioning/order, which is what the oracle
    // (plain GROUP BY + HAVING) certifies. At 100 TB: the full key
    // domain never shuffles — each task ships k counters, the recount
    // shuffles 8 keys.
    Q("sk_mg_heavyhitters",
      (s, d) => {
        val k = MgK
        graft.GraftExtensions.ensure(s)
        val stream = graft.Caches.registerTransient(
          mgKeyed(Tables.lineitem(s, d))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // pass 1: the NATIVE `mg(key, k)` aggregate — Spark plans a
        // two-phase ObjectHashAggregate, each task folds a k-counter
        // summary, the wire carries ≤k entries per task, and ONE
        // merged summary row reaches the driver (the mapPartitions +
        // driver-fold formulation this replaces shipped
        // partitions·(k+1) entries; the library fold survives as the
        // streaming census' per-batch face)
        val sk = stream.agg(expr(s"mg(k, $k)").as("sk"))
          .head.getStruct(0)
        val n = sk.getLong(0)
        val candidates = sk.getSeq[org.apache.spark.sql.Row](1)
          .map(_.getString(0))
        // pass 2: exact recount of the ≤k survivors only
        mgRecount(stream, candidates, n, k)
      },
      Some(mgOracle)),

    // GROUPED heavy hitters (ext.) — `mg(key, k)` per GROUP, the shape
    // the global face can't show: Spark plans ONE grouped two-phase
    // ObjectHashAggregate (≤k entries per (task, group) on the wire),
    // and — unlike the global face — the candidate set never touches
    // the driver: the per-group summaries EXPLODE into a
    // (group, candidate) relation (groups·k rows, broadcast-sized),
    // the recount is a broadcast semi-join + one hash agg, and the
    // per-group threshold cnt·(k+1) > n_g rides the n the summary
    // already carries. Fully distributed end-to-end; the OUTPUT is the
    // exact per-group heavy set whatever the partitioning (the MG
    // superset guarantee holds per group — every group's rows fold
    // into its own k-counter state). Oracle: per-group
    // GROUP BY + HAVING.
    Q("sk_mg_grouped",
      (s, d) => {
        val k = MgK
        graft.GraftExtensions.ensure(s)
        val keyed = graft.Caches.registerTransient(
          Tables.lineitem(s, d)
            .select(col("l_returnflag").as("g"), mgKeyCol.as("k"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val cand = keyed.groupBy(col("g"))
          .agg(expr(s"mg(k, $k)").as("sk"))
          .select(col("g"), col("sk.n").as("n_g"),
            explode(col("sk.entries.key")).as("k"))
        keyed.join(broadcast(cand), Seq("g", "k"))
          .groupBy(col("g"), col("k"), col("n_g"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * (k + 1) > col("n_g"))
          .select(col("g"), col("k"), col("cnt"))
      },
      Some(s"""WITH st AS (
                SELECT l_returnflag AS g, $mgKeySql AS k FROM lineitem),
              tf AS (SELECT g, k, CAST(count(*) AS BIGINT) AS cnt
                     FROM st GROUP BY 1, 2),
              ng AS (SELECT g, count(*) AS n FROM st GROUP BY 1)
              SELECT tf.g, tf.k, cnt
              FROM tf JOIN ng USING (g)
              WHERE cnt * ${MgK + 1} > ng.n"""))
  )

  /** Shared CTE chain of the KMV oracle — ends at `sk(side, h, rk)`,
    * the per-side bottom-k sketch over the distinct token-3-gram hash
    * universe (`hv` also in scope). Shared by `sk_kmv_overlap` and the
    * streaming census so the sketch construction cannot drift between
    * the batch and streaming faces.
    */
  private[queries] def kmvSketchCtes: String =
    s"""norm AS (
                SELECT doc_id % 2 AS side, string_split($normSql, ' ') AS toks
                FROM documents),
              npos AS (
                SELECT side, toks,
                       unnest(generate_series(1, len(toks) - 2)) AS i
                FROM norm WHERE len(toks) >= 3),
              hv AS (
                SELECT DISTINCT side,
                       ${h60("array_to_string(list_slice(toks, i, i + 2), ' ')")} AS h
                FROM npos),
              rkc AS (
                SELECT side, h,
                       row_number() OVER (PARTITION BY side ORDER BY h) AS rk
                FROM hv),
              sk AS (SELECT side, h, rk FROM rkc WHERE rk <= $KmvK)"""

  /** DuckDB column formula for CMS row i over an `hp` column — shared by
    * the heavy-hitter and join-size oracles so the hash family cannot
    * drift between them.
    */
  private def cmsColSql(i: Int): String = {
    val (a, b) = CmsRows(i)
    s"(($a * hp + $b) % 2147483647) % 1024"
  }

  /** The full-corpus CMS counter table as standalone oracle SQL — shared
    * with [[QStreaming]]'s incremental census, whose micro-batch merge
    * must land on exactly this table (counter linearity).
    */
  private[queries] def cmsCountersOracle: String = {
    val expand = CmsRows.indices.map(i =>
      s"SELECT $i AS rw, ${cmsColSql(i)} AS col, cnt FROM tf")
      .mkString("\n                UNION ALL ")
    s"""WITH occ AS (SELECT unnest($toksSql) AS tok FROM documents),
        tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
                 ${h60("tok")} % 2147483647 AS hp
               FROM occ GROUP BY 1),
        expanded AS (
            $expand)
        SELECT rw, col, CAST(sum(cnt) AS BIGINT) AS counter
        FROM expanded GROUP BY 1, 2"""
  }

  private def sketchHeavyHittersOracle: Option[String] = Some {
        val expand = CmsRows.indices.map(i =>
          s"SELECT $i AS rw, ${cmsColSql(i)} AS col, cnt FROM tf")
          .mkString("\n                UNION ALL ")
        val probe = CmsRows.indices.map(i =>
          s"SELECT tok, cnt, $i AS rw, ${cmsColSql(i)} AS col FROM top")
          .mkString("\n                UNION ALL ")
        s"""WITH occ AS (SELECT unnest($toksSql) AS tok FROM documents),
            tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
                     ${h60("tok")} % 2147483647 AS hp
                   FROM occ GROUP BY 1),
            expanded AS (
                $expand),
            counters AS (SELECT rw, col, CAST(sum(cnt) AS BIGINT) AS counter
                         FROM expanded GROUP BY 1, 2),
            top AS (SELECT tok, cnt, hp FROM tf
                    ORDER BY cnt DESC, tok ASC LIMIT 20),
            probes AS (
                $probe)
            SELECT p.tok, max(p.cnt) AS true_cnt, min(c.counter) AS est_cnt,
                   min(c.counter) - max(p.cnt) AS overcount
            FROM probes p JOIN counters c USING (rw, col)
            GROUP BY 1"""
  }
}
