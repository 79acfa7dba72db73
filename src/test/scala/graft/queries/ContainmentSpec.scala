package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** dd_containment — the asymmetric tier's three claims:
  *
  *  1. Detection: every planted quote child (first 15 tokens of its
  *     parent + unique tail) is found at containment ≥ 0.8.
  *  2. Asymmetry: most planted pairs sit BELOW a 0.5 Jaccard — the
  *     subset pairs resemblance-threshold tiers structurally miss.
  *  3. Scale guard: the df-occupancy cap removes the universal-gram
  *     quadratic term entirely (n² pairs → 0 on a boilerplate fixture),
  *     and on the real fixture no gram hits the cap, so the capped
  *     intersection (a lower bound in general) is EXACT here.
  */
class ContainmentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = {
    graft.GraftExtensions.ensure(spark)
    Tables.documents(spark, sf)
  }

  test("every planted quote child is detected; most sit below Jaccard 0.5") {
    val nParents = docs.filter(col("doc_id") % 7 === 0).count()
    val rows = SparkEntry.queries("dd_containment")(spark, sf)
      .filter(col("planted")).persist()
    assert(rows.count() == nParents,
      s"expected all $nParents planted pairs at containment >= 0.8")
    assert(rows.filter(col("containment") < 0.8).count() == 0)
    val lowJ = rows.filter(col("jaccard") < 0.5).count()
    assert(lowJ * 2 > nParents,
      s"only $lowJ of $nParents planted pairs are below Jaccard 0.5 — " +
        "the fixture no longer demonstrates the asymmetry")
    rows.unpersist()
  }

  test("df cap removes the universal-gram quadratic term (n^2 pairs -> 0)") {
    import spark.implicits._
    // 100 docs: 4 unique tokens + one shared 5-token boilerplate run.
    // The only cross-doc gram is the boilerplate window (df = 100).
    val boiler = (0 until 100).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d alpha beta gamma delta eps"))
      .toDF("doc_id", "text")
    val capped = QDedup.containmentPairs(boiler, cap = 64)
    assert(capped.count() == 0,
      "cap must drop the df=100 boilerplate gram and with it every pair")
    val uncapped = QDedup.containmentPairs(boiler, cap = 1000000)
    assert(uncapped.count() == 100L * 99 / 2,
      "without the cap the boilerplate gram alone is the full n^2")
  }

  test("no gram hits the cap on the query fixture, so detection is exact") {
    val corpus = QDedup.containmentCorpus(docs)
    val maxDf = graft.llmdata.TextOps.gramHashes(corpus, "doc_id", "text", 5)
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).collect().head.getLong(0)
    assert(maxDf <= 64,
      s"max gram df $maxDf exceeds the cap — the lower-bound caveat " +
        "would be live on this fixture and the exactness claim false")
  }
}
