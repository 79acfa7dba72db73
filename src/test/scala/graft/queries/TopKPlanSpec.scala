package graft.queries

import graft.{SparkEntry, SparkSpec}

/** o5's whole point is the PHYSICAL operator: orderBy+limit must plan
  * as TakeOrderedAndProject (bounded per-partition heaps), never as a
  * global rangepartitioning Exchange + full sort.
  */
class TopKPlanSpec extends SparkSpec {

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("o5_global_topk")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"global sort exchange leaked into:\n$plan")
    assert(df.count() == 20)
  }

  test("top-k aggregator partial-aggregates (ObjectHashAggregate both phases)") {
    val df = SparkEntry.queries("o6_topk_aggregate")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // typed-aggregator buffers run in ObjectHashAggregate; the operator
    // appears once per phase (partial map-side + merge reduce-side) —
    // that is the ≤k-rows-per-(task,group) shuffle claim
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate in:\n$plan")
  }

  test("top-k aggregator equals the window formulation") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val agg = SparkEntry.queries("o6_topk_aggregate")(spark, sf)
    val win = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("v").desc, col("l_orderkey"), col("l_linenumber"))
      graft.Tables.lineitem(spark, sf)
        .select(col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint").as("v"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("rk"), col("l_orderkey"),
          col("v").as("price_cents"))
    }
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }
}
