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
}
