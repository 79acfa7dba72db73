package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Embeddings.semanticDedup]] semantics on a hand-built geometry:
  * min-id survivor per ε-ball, cell restriction (cross-cell twins are
  * NOT pruned — that is the SemDeDup approximation, by design), and the
  * mega-cell star-pair degradation under the occupancy cap.
  */
class SemDedupSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** 4-dim toy vectors padded to length 4; centroids are ids 0 and 100 */
  private def table(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
  }

  private def cents(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  private def decisions(e: DataFrame, tau: Double): Map[Long, (Long, Int)] =
    Embeddings.semanticDedup(e, cents(e), tau)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap

  test("min-id survivor per ball; dissimilar cell-mates survive") {
    val e = table(Seq(
      0L -> Seq(1.0, 0.0, 0.0, 0.0), // centroid A
      1L -> Seq(0.9, 0.1, 0.0, 0.0), // near 0 → pruned
      2L -> Seq(0.8, 0.2, 0.0, 0.0), // near 0 and 1 → pruned
      3L -> Seq(0.1, -0.9, 0.0, 0.0), // same cell A, dissimilar → kept
      100L -> Seq(0.0, 0.0, 1.0, 0.0), // centroid B
      101L -> Seq(0.0, 0.0, 0.9, 0.1) // near 100 → pruned
    ))
    val d = decisions(e, tau = 0.9)
    assert(d(0L)._2 == 1 && d(1L)._2 == 0 && d(2L)._2 == 0)
    assert(d(3L)._2 == 1, s"dissimilar cell-mate pruned: $d")
    assert(d(100L)._2 == 1 && d(101L)._2 == 0)
  }

  test("cross-cell twins are not compared (the cluster approximation)") {
    // near-identical vectors (cosine ≈ 0.9998) leaning to opposite
    // centroids, so they land in different cells and never meet
    val e = table(Seq(
      0L -> Seq(1.0, 0.0, 1.0, 0.0),
      100L -> Seq(-1.0, 0.0, 1.0, 0.0),
      50L -> Seq(0.01, 0.0, 1.0, 0.0),
      150L -> Seq(-0.01, 0.0, 1.0, 0.0)
    ))
    val d = decisions(e, tau = 0.99)
    val cells = d.view.mapValues(_._1).toMap
    assume(cells(50L) != cells(150L),
      s"fixture must split the twins across cells, got $cells")
    assert(d(50L)._2 == 1 && d(150L)._2 == 1,
      s"cross-cell twins must both survive: $d")
  }

  test("mega-cell star-pairs under the cap: every member still decided against the rep") {
    // 30 near-identical vectors in one cell, cap 8 → star around id 0;
    // all non-rep members are pruned exactly as the clique would prune
    val e = table((0L until 30L).map(i =>
      i -> Seq(1.0, i * 1e-4, 0.0, 0.0)) :+
      (100L -> Seq(0.0, 0.0, 1.0, 0.0)))
    spark.conf.set("spark.graft.semdedup.maxBucket", "8")
    try {
      val d = decisions(e, tau = 0.99)
      assert(d(0L)._2 == 1 && (1L until 30L).forall(d(_)._2 == 0),
        s"star decisions wrong: $d")
      assert(d(100L)._2 == 1)
    } finally spark.conf.unset("spark.graft.semdedup.maxBucket")
  }

  test("capped and uncapped agree when similarity is transitive-dense") {
    val e = table((0L until 30L).map(i =>
      i -> Seq(1.0, i * 1e-4, 0.0, 0.0)) :+
      (100L -> Seq(0.0, 0.0, 1.0, 0.0)))
    def run(): Map[Long, (Long, Int)] = decisions(e, tau = 0.99)
    spark.conf.set("spark.graft.semdedup.maxBucket", "8")
    val capped = try run() finally
      spark.conf.unset("spark.graft.semdedup.maxBucket")
    assert(capped == run(), "cap changed decisions on a dense ball")
  }
}
