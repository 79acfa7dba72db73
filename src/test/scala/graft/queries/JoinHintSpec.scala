package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Each join hint must actually select its physical strategy — the whole
  * point of x11 is that the lever works when size estimates don't.
  */
class JoinHintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planFor(hint: String): String = {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    orders.join(cust.hint(hint), col("o_custkey") === col("c_custkey"))
      .queryExecution.executedPlan.toString
  }

  test("broadcast hint plans BroadcastHashJoin") {
    assert(planFor("broadcast").contains("BroadcastHashJoin"))
  }

  test("merge hint plans SortMergeJoin") {
    assert(planFor("merge").contains("SortMergeJoin"))
  }

  test("shuffle_hash hint plans ShuffledHashJoin") {
    assert(planFor("shuffle_hash").contains("ShuffledHashJoin"))
  }
}
