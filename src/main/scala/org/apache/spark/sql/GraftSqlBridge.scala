package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the graft library needs: wrap a custom
  * LogicalPlan (the [[graft.plans.AsOfJoinNode]]) into a DataFrame so the
  * planner strategy registered via SparkSessionExtensions can plan it.
  * This is the standard extension-library pattern (every DSv2-adjacent
  * library ships exactly this bridge); nothing else reaches into
  * Spark internals.
  */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      session.asInstanceOf[classic.SparkSession], plan)
}
