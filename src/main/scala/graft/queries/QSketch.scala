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
      Some {
        val rowsAB = Seq((40503L, 12345L), (48271L, 7919L),
          (69621L, 31337L), (16807L, 97531L))
        def colOf(i: Int) = {
          val (a, b) = rowsAB(i)
          s"(($a * hp + $b) % 2147483647) % 1024"
        }
        val expand = rowsAB.indices.map(i =>
          s"SELECT $i AS rw, ${colOf(i)} AS col, cnt FROM tf")
          .mkString("\n                UNION ALL ")
        val probe = rowsAB.indices.map(i =>
          s"SELECT tok, cnt, $i AS rw, ${colOf(i)} AS col FROM top")
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
      })
  )
}
