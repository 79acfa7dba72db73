package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** As-of join family (SURVEY.md §2.3 J11/J12): backward merge_asof for
  * amount-outstanding and ratings enrichment
  * (stage1/stage1_pipeline.py:739-759, 884-902).
  *
  * Scale notes: [[AsOfJoin.backward]] unions both sides into one event
  * stream and forward-fills with a single shuffle+sort of |L|+|R| rows —
  * the optimal distributed as-of plan; a range join would be O(n·m) per
  * key. The oracle uses DuckDB's native ASOF JOIN.
  */
object QAsOf extends Registry {

  /** "rating events": one per (id, ts) from purchase events, deduped to the
    * highest ord per timestamp so both engines see a unique right side.
    */
  private def ratingEvents(s: SparkSession, d: String): DataFrame =
    Dedup.keepLast(
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("id"), col("ts").as("r_ts"),
          col("event_id").as("r_ord"),
          col("value").cast("decimal(18,2)").as("rating")),
      keys = Seq("id", "r_ts"),
      order = Seq(col("r_ord")))

  private val ratingSql =
    """SELECT id, r_ts, rating FROM (
         SELECT user_id AS id, ts AS r_ts, value_d AS rating,
                row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) AS rn
         FROM (SELECT *, CAST(value AS DECIMAL(18,2)) AS value_d FROM events)
         WHERE event_type = 'purchase') x WHERE rn = 1"""

  def qs: Seq[Q] = Seq(

    // J11 — backward as-of join (inclusive): each trade picks the latest
    // rating event at-or-before its timestamp, then coalesce-fills with a
    // default (the offering_amt fallback shape).
    Q("j11_asof_backward",
      (s, d) => {
        val left = Tables.events(s, d)
          .select(col("event_id").as("ord"), col("user_id").as("id"), col("ts"))
        AsOfJoin.backward(
            left,
            ratingEvents(s, d),
            by = Seq("id"),
            leftOn = "ts", rightOn = "r_ts",
            payload = Seq("rating"),
            rightTieBreak = Seq("r_ord"))
          .select(col("ord"), col("id"),
            coalesce(col("rating").cast("double"), lit(0.0)).as("rating_filled"))
      },
      Some(s"""WITH re AS ($ratingSql)
              SELECT e.event_id AS ord, e.user_id AS id,
                     coalesce(CAST(re.rating AS DOUBLE), 0.0) AS rating_filled
              FROM events e ASOF LEFT JOIN re
                ON e.user_id = re.id AND e.ts >= re.r_ts""")),

    // J12 — strict backward as-of (allow_exact_matches=False): only events
    // strictly before the left timestamp qualify.
    Q("j12_asof_strict",
      (s, d) => {
        val left = Tables.events(s, d)
          .select(col("event_id").as("ord"), col("user_id").as("id"), col("ts"))
        AsOfJoin.backward(
            left,
            ratingEvents(s, d),
            by = Seq("id"),
            leftOn = "ts", rightOn = "r_ts",
            payload = Seq("rating"),
            rightTieBreak = Seq("r_ord"),
            strict = true)
          .select(col("ord"), col("id"), col("rating").cast("double").as("rating"))
      },
      Some(s"""WITH re AS ($ratingSql)
              SELECT e.event_id AS ord, e.user_id AS id,
                     CAST(re.rating AS DOUBLE) AS rating
              FROM events e ASOF LEFT JOIN re
                ON e.user_id = re.id AND e.ts > re.r_ts""")),

    // J28 (ext.) — the NATIVE as-of join: a custom Catalyst logical
    // node + planner strategy + physical sorted-merge operator
    // (plans.AsOfJoinNode/AsOfJoinStrategy/AsOfMergeJoinExec, injected
    // via SparkSessionExtensions — the whole-operator extension tier).
    // Same single-shuffle-per-side cost as j11's composed form, but
    // each side keeps its own width through the sort: no union, no
    // null-widened right rows, no running payload struct — the merge
    // streams both sorted sides once per partition with O(1) state.
    // Hash-gated against the SAME oracle as j11, so the two
    // formulations can never drift apart.
    Q("j28_asof_native",
      (s, d) => {
        val left = Tables.events(s, d)
          .select(col("event_id").as("ord"), col("user_id").as("id"), col("ts"))
        AsOfJoin.backwardNative(
            left,
            ratingEvents(s, d).select(col("id"), col("r_ts"), col("rating")),
            by = Seq("id"),
            leftOn = "ts", rightOn = "r_ts",
            payload = Seq("rating"))
          .select(col("ord"), col("id"),
            coalesce(col("rating").cast("double"), lit(0.0)).as("rating_filled"))
      },
      Some(s"""WITH re AS ($ratingSql)
              SELECT e.event_id AS ord, e.user_id AS id,
                     coalesce(CAST(re.rating AS DOUBLE), 0.0) AS rating_filled
              FROM events e ASOF LEFT JOIN re
                ON e.user_id = re.id AND e.ts >= re.r_ts""")),

    // J27 (ext.) — FORWARD as-of join (merge_asof direction="forward"):
    // each event picks the EARLIEST rating at-or-after its timestamp —
    // the "next scheduled fixing/settlement" lookup backward can't
    // express. Same single shuffle+sort plan, fill flipped to
    // first-following (AsOfJoin.forward); DuckDB's native ASOF with the
    // inequality reversed is the oracle.
    Q("j27_asof_forward",
      (s, d) => {
        val left = Tables.events(s, d)
          .select(col("event_id").as("ord"), col("user_id").as("id"), col("ts"))
        AsOfJoin.forward(
            left,
            ratingEvents(s, d),
            by = Seq("id"),
            leftOn = "ts", rightOn = "r_ts",
            payload = Seq("rating"),
            rightTieBreak = Seq("r_ord"))
          .select(col("ord"), col("id"),
            col("rating").cast("double").as("next_rating"))
      },
      Some(s"""WITH re AS ($ratingSql)
              SELECT e.event_id AS ord, e.user_id AS id,
                     CAST(re.rating AS DOUBLE) AS next_rating
              FROM events e ASOF LEFT JOIN re
                ON e.user_id = re.id AND e.ts <= re.r_ts""")),

    // J29 (ext.) — the NATIVE as-of join, FORWARD direction: j28's
    // operator with the merge cursor flipped (skip rights before the
    // window; the row the cursor rests on matches without being
    // consumed, so later left rows can share it). Completes the native
    // tier's direction coverage; hash-gated against the SAME oracle as
    // j27, so native and composed forward can never drift.
    Q("j29_asof_forward_native",
      (s, d) => {
        val left = Tables.events(s, d)
          .select(col("event_id").as("ord"), col("user_id").as("id"), col("ts"))
        AsOfJoin.forwardNative(
            left,
            ratingEvents(s, d).select(col("id"), col("r_ts"), col("rating")),
            by = Seq("id"),
            leftOn = "ts", rightOn = "r_ts",
            payload = Seq("rating"))
          .select(col("ord"), col("id"),
            col("rating").cast("double").as("next_rating"))
      },
      Some(s"""WITH re AS ($ratingSql)
              SELECT e.event_id AS ord, e.user_id AS id,
                     CAST(re.rating AS DOUBLE) AS next_rating
              FROM events e ASOF LEFT JOIN re
                ON e.user_id = re.id AND e.ts <= re.r_ts""")),

    // J24 — backward as-of with TOLERANCE (merge_asof's tolerance=
    // Timedelta): a rating older than 2 days at match time is discarded
    // (null), as if never seen — the staleness bound every market-data
    // enrichment carries. Same single shuffle+sort as j11; the gate is
    // one codegen'd microsecond comparison on the matched timestamp
    // riding in the payload struct (AsOfJoin.backwardTolerance).
    Q("j24_asof_tolerance",
      (s, d) => {
        val left = Tables.events(s, d)
          .select(col("event_id").as("ord"), col("user_id").as("id"),
            col("ts"))
        AsOfJoin.backwardTolerance(
            left,
            ratingEvents(s, d),
            by = Seq("id"),
            leftOn = "ts", rightOn = "r_ts",
            payload = Seq("rating"),
            toleranceMicros = 172800000000L, // 2 days
            rightTieBreak = Seq("r_ord"))
          .select(col("ord"), col("id"),
            col("rating").cast("double").as("rating"))
      },
      Some(s"""WITH re AS ($ratingSql)
              SELECT e.event_id AS ord, e.user_id AS id,
                     CASE WHEN epoch_us(e.ts) - epoch_us(re.r_ts)
                            <= 172800000000
                          THEN CAST(re.rating AS DOUBLE) END AS rating
              FROM events e ASOF LEFT JOIN re
                ON e.user_id = re.id AND e.ts >= re.r_ts"""))
  )
}
