package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length ("gaps and islands") labelling: consecutive equal values of
  * `valueCol` within a partition get one island id. This is the Spark form
  * of the reference's plateau detector core (W12,
  * `stage1/helper_functions.py:913-979`): a change-flag via `lag` plus a
  * running sum — two window passes over one partitioning, no shuffle beyond
  * the first.
  */
object GapsIslands {

  /** Adds `islandCol` (1-based island id per partition). `order` must be a
    * total order inside each partition (determinism).
    */
  def islandId(
      df: DataFrame,
      partition: Seq[String],
      order: Seq[Column],
      valueCol: String,
      islandCol: String): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    val chg = when(
      lag(col(valueCol), 1).over(w).isNull ||
        lag(col(valueCol), 1).over(w) =!= col(valueCol), 1).otherwise(0)
    df.withColumn(islandCol,
      sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }
}
