package graft.app

import graft.{Plans, SparkSpec}

/** Exchange budgets for the round-8 additions — the scaladoc scale
  * claims as regression tests (same contract as PlanBudgetSpec).
  */
class Round8PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("RANGE window: one keyed shuffle serves the value frame") {
    val c = Plans.planCounts(q("w22_range_window"))
    info(s"w22 shuffles=${c.shuffles}")
    assert(c.shuffles <= 1, s"w22 shuffles: ${c.shuffles}")
  }

  test("rank family: one shuffle+sort serves all three functions") {
    val c = Plans.planCounts(q("w23_rank_family"))
    info(s"w23 shuffles=${c.shuffles}")
    assert(c.shuffles <= 1, s"w23 shuffles: ${c.shuffles}")
  }

  test("drawdown: one cumulative frame, one shuffle") {
    val c = Plans.planCounts(q("w24_drawdown"))
    info(s"w24 shuffles=${c.shuffles}")
    assert(c.shuffles <= 1, s"w24 shuffles: ${c.shuffles}")
  }

  test("forward as-of: same exchange budget as backward") {
    // 2 like j11_asof_backward in PLANS.md: the right side's keepLast
    // dedup window + the union-stream as-of window itself
    val c = Plans.planCounts(q("j27_asof_forward"))
    info(s"j27 shuffles=${c.shuffles}")
    assert(c.shuffles <= 2, s"j27 shuffles: ${c.shuffles}")
  }

  test("weighted median: window + total + final agg share the group key") {
    val c = Plans.planCounts(q("a22_weighted_median"))
    info(s"a22 shuffles=${c.shuffles}")
    assert(c.shuffles <= 2, s"a22 shuffles: ${c.shuffles}")
  }

  test("group mode: two hash-aggs + group-cardinality window only") {
    val c = Plans.planCounts(q("a21_group_mode"))
    info(s"a21 shuffles=${c.shuffles}")
    assert(c.shuffles <= 2, s"a21 shuffles: ${c.shuffles}")
  }

  test("triangles: the wedge close is a broadcast, never a wedge shuffle") {
    val c = Plans.planCounts(q("g1_triangles"))
    info(s"g1 shuffles=${c.shuffles} broadcasts=${c.broadcasts}")
    assert(c.broadcasts >= 1, s"g1 broadcasts: ${c.broadcasts}")
    // every exchange in the DAG is over EDGE-scale relations (the basket
    // self-join, two distincts, the degree agg, the orientation joins,
    // the wedge self-join inputs, the per-node agg — several of them
    // double-counted across the persisted orientation's two consumers);
    // the invariant that matters is that the 41M-row WEDGE stream itself
    // never exchanges, which the broadcast close above pins
    assert(c.shuffles <= 24, s"g1 shuffles: ${c.shuffles}")
    graft.Caches.clearTransient()
  }

  test("diversified top-k: keyed cap shuffle, then TakeOrderedAndProject") {
    val df = q("o7_diversified_topk")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global slice must plan TakeOrderedAndProject:\n${plan.take(1200)}")
  }

  test("error replay joins stay co-partitioned on the id keys") {
    val c = Plans.planCounts(q("tp_error_replay"))
    info(s"tp_error_replay shuffles=${c.shuffles}")
    // shift flags (2 windows) + bounce flags + the two (id, ord) joins
    // + the per-id screens' windows — all on the id family of keys
    assert(c.shuffles <= 7, s"tp_error_replay shuffles: ${c.shuffles}")
    graft.Caches.clearAll()
  }
}
