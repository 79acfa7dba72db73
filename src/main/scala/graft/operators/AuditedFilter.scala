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
    *
    * Internally: first-FAILING-stage per row, so each predicate is
    * evaluated once (the naive cumulative-AND form repeats stage i's
    * predicate in every later counter — O(n²) expression size that blew
    * past janino's 64 KB method limit at ~9 stages and dropped the whole
    * stage out of codegen). A row survives stages 0..i iff its first
    * failure is > i. Null predicates count as failures, matching what
    * `filter()` does to the frame itself.
    */
  def ledger(df: DataFrame, stages: Seq[Stage]): DataFrame = {
    val failStage = stages.zipWithIndex.foldRight(lit(stages.length)) {
      case ((s, i), acc) =>
        when(!coalesce(s.predicate, lit(false)), lit(i)).otherwise(acc)
    }
    val survivors = stages.indices.map { i =>
      sum(when(col("__fs") > i, 1L).otherwise(0L)).as(s"__s$i")
    }
    val totals = df.withColumn("__fs", failStage)
      .agg(count(lit(1)).as("__n"), survivors: _*)
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
