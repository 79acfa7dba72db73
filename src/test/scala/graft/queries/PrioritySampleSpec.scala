package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Priority sampling (sk_priority_sample) — the structural guarantees
  * that hold for EVERY draw, plus the measured accuracy of this
  * (deterministic) one:
  *
  *  1. Inclusion theorem: q_i = w_i·2^60/(h_i+1) ≥ w_i (since
  *     h_i+1 ≤ 2^60), so any item with w_i > tau outranks tau and is
  *     ALWAYS sampled — heavy hitters cannot be missed.
  *  2. The sample is exactly k items, and every per-item estimate
  *     max(w_i, tau) is ≥ the item's own weight — subset-sum estimates
  *     never undercount the sampled mass itself.
  */
class PrioritySampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = {
    graft.GraftExtensions.ensure(spark)
    Tables.documents(spark, sf)
  }

  test("items heavier than tau are always in the sample; sample is exactly k") {
    val k = QSketch.PriK
    val ranked = QSketch.priorityRanked(docs, k).persist()
    assert(ranked.count() == k + 1, "top-(k+1) frame must have k+1 rows")
    val tau = ranked.filter(col("rk") === k + 1).collect().head.getAs[Double]("q")
    // the inclusion theorem over the FULL relation, not just the top frame
    val all = docs.select(col("doc_id"),
        size(graft.llmdata.TextOps.tokens(col("text"))).cast("bigint").as("w"))
    val heavy = all.filter(col("w").cast("double") > tau)
    val sampled = ranked.filter(col("rk") <= k).select("doc_id")
    assert(heavy.join(sampled, Seq("doc_id"), "left_anti").count() == 0,
      "an item with w > tau escaped the sample")
    ranked.unpersist()
  }

  test("top-(k+1) merges: top-(k+1) of partial top-(k+1)'s == top-(k+1) of whole") {
    // the discard-safety theorem stream_priority_sample relies on: a
    // doc outside its part's top-(k+1) is preceded by k+1 same-part
    // docs in the (q desc, doc_id) total order, all surviving into the
    // union — so per-part tops lose nothing the global top needs
    val k = QSketch.PriK
    val parts = (0 until 3).map(i =>
      QSketch.priorityRanked(docs.filter(col("doc_id") % 3 === i), k)
        .select(col("doc_id"), col("source"), col("w"), col("q")))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id").asc)
    val merged = parts.reduce(_.unionByName(_))
      .orderBy(col("q").desc, col("doc_id").asc).limit(k + 1)
      .withColumn("rk", row_number().over(win))
    val whole = QSketch.priorityRanked(docs, k)
      .select(col("doc_id"), col("source"), col("w"), col("q"), col("rk"))
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0,
      "merged partial tops must equal the whole-relation top-(k+1)")
  }

  test("per-item estimates floor at the item's own weight and grade within the band") {
    val k = QSketch.PriK
    val rows = SparkEntry.queries("sk_priority_sample")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_sampled")).sum == k,
      "per-source sample counts must total k")
    val est = rows.map(_.getAs[Long]("est_tokens_micro")).sum / 1e6
    val truth = rows.map(_.getAs[Long]("true_tokens")).sum.toDouble
    // deterministic hash draw => a fixed measurement; ~5% at k=128 on
    // this corpus (the estimator is unbiased over the hash family; the
    // band here is 3x the observed error to absorb testdata refreshes)
    assert(math.abs(est - truth) / truth < 0.15,
      s"total estimate off by ${math.abs(est - truth) / truth}")
    // every source's estimate covers at least the sampled docs' own mass
    val ranked = QSketch.priorityRanked(docs, k)
    val tau = ranked.filter(col("rk") === k + 1).collect().head.getAs[Double]("q")
    val sampledMass = ranked.filter(col("rk") <= k)
      .groupBy(col("source")).agg(sum(col("w")).as("wsum")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("wsum")).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val estMicro = r.getAs[Long]("est_tokens_micro")
      assert(estMicro >= sampledMass.getOrElse(src, 0L) * 1000000L,
        s"$src estimate under the sampled items' own weight")
    }
  }
}
