package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-hop label propagation (g2_label_prop) — the closed form that
  * makes the heuristic deterministic: after k synchronous min-label
  * rounds, label(v) = min id within v's k-hop neighborhood. On a path
  * graph 1–2–…–n that is exactly max(1, v − k).
  */
class LabelPropSpec extends SparkSpec {

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
