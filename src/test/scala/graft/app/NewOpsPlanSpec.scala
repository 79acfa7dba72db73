package graft.app

import graft.{Plans, SparkSpec}

/** Exchange budgets for the round-7b additions — the scaladoc scale
  * claims as regression tests (same contract as PlanBudgetSpec).
  */
class NewOpsPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("grid interval join: cell join + final agg only") {
    val c = Plans.planCounts(q("j23_interval_grid_join"))
    info(s"j23 shuffles=${c.shuffles} broadcasts=${c.broadcasts}")
    assert(c.shuffles <= 3, s"j23 shuffles: ${c.shuffles}")
  }

  test("rolling beta: one window shuffle, all stats share the frame") {
    val c = Plans.planCounts(q("w18_rolling_beta"))
    info(s"w18 shuffles=${c.shuffles}")
    assert(c.shuffles <= 1, s"w18 shuffles: ${c.shuffles}")
  }

  test("grouped quantiles: one window shuffle + broadcast probe") {
    val c = Plans.planCounts(q("a17_grouped_quantiles"))
    info(s"a17 shuffles=${c.shuffles} broadcasts=${c.broadcasts}")
    assert(c.shuffles <= 1, s"a17 shuffles: ${c.shuffles}")
  }

  test("rag retrieval: bounded exchanges over query-hit passages only") {
    val c = Plans.planCounts(q("tx_rag_retrieve"))
    info(s"rag shuffles=${c.shuffles} broadcasts=${c.broadcasts}")
    assert(c.shuffles <= 6, s"tx_rag_retrieve shuffles: ${c.shuffles}")
    graft.Caches.clearTransient()
  }

  test("compaction planner: manifest agg + per-partition window + plan agg") {
    val c = Plans.planCounts(q("s17_compaction_plan"))
    info(s"s17 shuffles=${c.shuffles}")
    assert(c.shuffles <= 2, s"s17 shuffles: ${c.shuffles}")
  }
}
