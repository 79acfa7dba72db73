package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-hop label propagation (g2_label_prop) — the closed form that
  * makes the heuristic deterministic: after k synchronous min-label
  * rounds, label(v) = min id within v's k-hop neighborhood. On a path
  * graph 1–2–…–n that is exactly max(1, v − k).
  */
class LabelPropSpec extends SparkSpec {

  test("g2 arms agree and auto selects by the measured node count") {
    val sf = "/root/testdata/sf0.001"
    // barrier off so the returned frame keeps its round DAG — with the
    // per-round localCheckpoint the plan is a bare RDD scan and carries
    // no join shape to assert on
    def run(mode: Option[String], cap: Option[String])
        : (Map[Long, Long], String) = {
      spark.conf.set("spark.graft.labelprop.barrier", "false")
      mode.foreach(spark.conf.set("spark.graft.labelprop.join", _))
      cap.foreach(
        spark.conf.set("spark.graft.labelprop.broadcastMaxNodes", _))
      try {
        val df = graft.SparkEntry.queries("g2_label_prop")(spark, sf)
        // the ANALYZED plan retains the per-round broadcast hints —
        // the decision's witness; the physical plan can coincide at
        // fixture size because the planner broadcasts the tiny label
        // table on its own size estimate either way
        val plan = df.queryExecution.analyzed.toString
        val rows = df.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.Caches.clearTransient()
        (rows, plan)
      } finally {
        spark.conf.unset("spark.graft.labelprop.join")
        spark.conf.unset("spark.graft.labelprop.broadcastMaxNodes")
        spark.conf.unset("spark.graft.labelprop.barrier")
      }
    }
    val (bRows, bPlan) = run(Some("broadcast"), None)
    val (sRows, sPlan) = run(Some("shuffle"), None)
    assert(bRows.nonEmpty && sRows == bRows, "g2 join arms disagree")
    // the broadcast arm hints every round join; the shuffle arm's
    // physical choice is the planner's at fixture size, so the HINT
    // in the analyzed plan is the decision's witness on both sides
    assert(bPlan.contains("ResolvedHint"),
      s"broadcast arm carries no broadcast hint:\n${bPlan.take(2000)}")
    assert(!sPlan.contains("ResolvedHint"),
      s"shuffle arm must not hint a broadcast:\n${sPlan.take(2000)}")
    // auto, cap 0: every node set exceeds it → the shuffle arm
    val (loRows, loPlan) = run(None, Some("0"))
    // auto, default cap (8M): fixture far under → the broadcast arm
    val (hiRows, hiPlan) = run(None, None)
    assert(loRows == bRows && hiRows == bRows, "auto arms disagree")
    assert(hiPlan.contains("ResolvedHint"),
      s"auto under the cap did not pick broadcast:\n${hiPlan.take(2000)}")
    assert(!loPlan.contains("ResolvedHint"),
      s"auto over the cap still picked broadcast:\n${loPlan.take(2000)}")
  }

  test("k rounds on a path graph: label(v) == max(1, v - k)") {
    import spark.implicits._
    val n = 12
    val e = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("u", "v")
    val sym = e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
    val nodes = sym.select(col("src").as("id")).distinct()
    val adj = sym.unionByName(
      nodes.select(col("id").as("src"), col("id").as("dst")))
    for (k <- Seq(1, 3, 5)) {
      var lbl = nodes.select(col("id"), col("id").as("lbl"))
      for (_ <- 1 to k) {
        lbl = adj.join(lbl, adj("src") === lbl("id"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("lbl"))
          .select(col("dst").as("id"), col("lbl"))
          .localCheckpoint(true)
      }
      val got = lbl.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("lbl")).toMap
      (1 to n).foreach { v =>
        assert(got(v.toLong) == math.max(1, v - k).toLong,
          s"k=$k node $v: got ${got(v.toLong)}")
      }
    }
  }
}
