package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dedup utilities.
  *
  * The reference's `sort_values(...).drop_duplicates(keep='first'|'last')`
  * idiom (`stage1/stage1_pipeline.py:249-255` Enhanced>Standard>144A panel
  * priority; `stage1/stage1_pipeline.py:722-726` latest amount-outstanding)
  * is NOT portable to Spark's `dropDuplicates` (row order after a shuffle is
  * undefined), so both map to `row_number` over an explicit total order —
  * the #1 determinism trap called out in SURVEY.md §4.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order`.
    * `order` must be a total order within each key group for determinism.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val rn = "__dedup_rn"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** Keep the last row per key under `order` (i.e. first under reversed
    * order). `order` must be plain Columns (not `.asc`/`.desc` SortOrders —
    * reversing an existing SortOrder is not evaluable).
    */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))
}
