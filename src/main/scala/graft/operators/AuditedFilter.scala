package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audited filter chain — the reference's `log_filter` ledger
  * (`stage0/create_daily_enhanced_trace.py:42-107`): every stage records
  * (stage, rows_before, rows_after, removed), exported as a first-class
  * DataFrame. Row-count reconciliation is the reference's primary
  * regression signal (SURVEY.md §5.1).
  *
  * Scale note: counts are computed in ONE pass over the input with
  * conditional aggregates — stage i's surviving predicate is the AND of
  * predicates 1..i — instead of materialising and counting the frame
  * after each stage (the reference's N actions over shrinking frames).
  */
object AuditedFilter {

  final case class Stage(name: String, predicate: Column)

  /** the filtered frame (all predicates applied) */
  def apply(df: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(df)((d, s) => d.filter(s.predicate))

  /** the audit ledger: one row per stage with before/after/removed counts,
    * computed in a single aggregation pass.
    */
  def ledger(df: DataFrame, stages: Seq[Stage]): DataFrame = {
    val cumulative = stages.scanLeft(lit(true))((acc, s) => acc && s.predicate).tail
    val survivors = cumulative.zipWithIndex.map { case (p, i) =>
      sum(when(p, 1L).otherwise(0L)).as(s"__s$i")
    }
    val totals = df.agg(count(lit(1)).as("__n"), survivors: _*)
    val rows = stages.indices.map { i =>
      val before = if (i == 0) col("__n") else col(s"__s${i - 1}")
      struct(lit(stages(i).name).as("stage"),
        before.as("rows_before"),
        col(s"__s$i").as("rows_after"),
        (before - col(s"__s$i")).as("removed"))
    }
    totals.select(explode(array(rows: _*)).as("a"))
      .select(col("a.stage"), col("a.rows_before"), col("a.rows_after"),
        col("a.removed"))
  }
}
