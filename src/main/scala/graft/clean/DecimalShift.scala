package graft.clean

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decimal-shift price corrector (W7) — Spark restatement of the
  * reference's `decimal_shift_corrector`
  * (`stage0/create_daily_enhanced_trace.py:764-963`, params
  * `stage0/_trace_settings.py:53-66`).
  *
  * Entirely pure column algebra — no UDF: anchors are rolling medians over
  * per-(id,dt,price)-deduplicated rows (the reference's duplicate-print
  * guard) joined back m:1; the factor search is a foldLeft over the four
  * candidate factors preserving the reference's first-strictly-better tie
  * rule; acceptance gates are one boolean expression.
  *
  * Scale: one shuffle on `id` for the anchor windows, one broadcast-
  * friendly equi-join back on (id, dt, price). Everything stays inside
  * whole-stage codegen.
  */
object DecimalShift {

  final case class Params(
      factors: Seq[Double] = Seq(0.1, 0.01, 10.0, 100.0),
      tolPctGood: Double = 0.02,
      tolAbsGood: Double = 8.0,
      tolPctBad: Double = 0.05,
      lowPr: Double = 5.0,
      highPr: Double = 300.0,
      window: Int = 5,
      improvementFrac: Double = 0.2,
      parSnap: Boolean = true,
      parBand: Double = 15.0)

  private val eps = 1e-12

  /** median of a pre-sorted double array expression (pandas interpolating
    * median: middle element or mean of the two middles).
    */
  def medianOfSorted(arr: String): String =
    s"""case when size($arr) = 0 then null
        when size($arr) % 2 = 1 then element_at($arr, cast(size($arr) div 2 + 1 as int))
        else (element_at($arr, cast(size($arr) div 2 as int))
              + element_at($arr, cast(size($arr) div 2 + 1 as int))) / 2 end"""

  /** Adds `dec_shift_flag` (int), `dec_shift_factor`, `suggested_price`,
    * `anchor_price` to `df`. `ordCol` must be a total order within
    * (idCol, dtCol) — the reference's stable (date, time) sort.
    */
  def withSuggestions(
      df: DataFrame,
      idCol: String,
      dtCol: String,
      ordCol: String,
      priceCol: String,
      p: Params = Params()): DataFrame = {
    val w = p.window
    val price = col(priceCol).cast("double")

    // anchors on (id, dt, price)-deduped rows, positionally windowed in
    // (dt, ord) order — the reference's drop_duplicates(keep='first')
    val work = Dedup.keepFirst(
        df.select(col(idCol), col(dtCol), col(ordCol), price.as("__p")),
        keys = Seq(idCol, dtCol, "__p"),
        order = Seq(col(ordCol)))
    val frame = s"partition by $idCol order by $dtCol, $ordCol"
    def medOver(lo: String, hi: String): String =
      medianOfSorted(
        s"sort_array(collect_list(__p) over ($frame rows between $lo and $hi))")
    val anchored = work
      .withColumn("__med_c",
        expr(s"""case when size(collect_list(__p) over
            ($frame rows between $w preceding and $w following)) >= ${w + 1}
          then ${medOver(s"$w preceding", s"$w following")} end"""))
      .withColumn("__med_f", expr(medOver("current row", s"$w following")))
      .withColumn("__med_b", expr(medOver(s"$w preceding", "current row")))
      // back-median has min_periods=1 → never null; the reference's global-
      // median and per-(id,dt) fallbacks are therefore unreachable
      .withColumn("anchor_price",
        coalesce(col("__med_c"), col("__med_f"), col("__med_b")))
      .select(col(idCol), col(dtCol), col("__p"), col("anchor_price"))

    val joined = df
      .withColumn("__p", price)
      .join(anchored, Seq(idCol, dtCol, "__p"), "left")

    val anchor = col("anchor_price")

    // Per-factor relative deviations as REAL COLUMNS, then least() + a
    // first-match CASE — semantically the "first strictly-better candidate
    // wins" rule of the reference, and exactly the r1..r4 formulation the
    // DuckDB oracle uses. (The previous Column-level foldLeft embedded the
    // accumulated tree twice per factor — exponential expression blowup
    // that pushed the generated projection past janino's 64 KB method
    // limit, silently dropping the whole stage out of codegen and paying
    // a multi-second doomed-compile on first run. Stacked withColumns stay
    // separate projections because each alias is non-cheap and
    // multiply-referenced, so codegen evaluates each once.)
    // nullif guard on the anchor: an all-zero print window would make the
    // median 0 — DuckDB's x/0 is NULL while Spark's ANSI mode throws, so
    // the NULL is made explicit (a null rel never passes the gates)
    val anchorDiv = expr("nullif(anchor_price, 0.0d)")
    val withR = p.factors.zipWithIndex.foldLeft(
        joined.withColumn("__raw_rel", abs(col("__p") - anchor) / anchorDiv)) {
      case (d, (f, i)) =>
        val cand = col("__p") * f
        d.withColumn(s"__r${i + 1}",
          when(cand >= p.lowPr && cand <= p.highPr, abs(cand - anchor) / anchorDiv))
    }
    val rCols = p.factors.indices.map(i => col(s"__r${i + 1}"))
    val withBest = withR
      .withColumn("__best_rel", least(rCols: _*))
      // reverse-order chains so EARLIER factors take precedence on ties
      .withColumn("__best_price",
        p.factors.zipWithIndex.reverse.foldLeft(lit(null).cast("double")) {
          case (acc, (f, i)) =>
            when(col(s"__r${i + 1}") === col("__best_rel"), col("__p") * f)
              .otherwise(acc)
        })

    val absGood = abs(col("__best_price") - anchor) <= p.tolAbsGood + eps
    val parOk =
      if (p.parSnap)
        abs(anchor - 100.0) <= p.parBand &&
          abs(col("__best_price") - 100.0) <= p.parBand
      else lit(false)
    val flag = (col("__raw_rel") > p.tolPctBad - eps) &&
      ((col("__best_rel") <= p.tolPctGood + eps) || absGood || parOk) &&
      (col("__best_rel") <= col("__raw_rel") * p.improvementFrac + eps)

    val bestFactor = p.factors.zipWithIndex.reverse
      .foldLeft(lit(null).cast("double")) { case (acc, (f, i)) =>
        when(col(s"__r${i + 1}") === col("__best_rel"), lit(f)).otherwise(acc)
      }
    withBest
      .withColumn("dec_shift_flag", when(flag, 1).otherwise(0))
      .withColumn("dec_shift_factor",
        when(col("dec_shift_flag") === 1, bestFactor).otherwise(1.0))
      .withColumn("suggested_price",
        when(col("dec_shift_flag") === 1, col("__best_price"))
          .otherwise(col("__p")))
      .drop("__p", "__raw_rel", "__best_rel", "__best_price")
      .drop(p.factors.indices.map(i => s"__r${i + 1}"): _*)
  }

  /** Apply suggestions: overwrite `priceCol` (as double) where flagged. */
  def cleaned(
      df: DataFrame,
      idCol: String,
      dtCol: String,
      ordCol: String,
      priceCol: String,
      p: Params = Params()): DataFrame =
    withSuggestions(df, idCol, dtCol, ordCol, priceCol, p)
      .withColumn(priceCol, col("suggested_price"))
      .drop("dec_shift_flag", "dec_shift_factor", "suggested_price",
        "anchor_price")
}
