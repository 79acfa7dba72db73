package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed-layout flagship: trades written `bucketBy(8, "id")` feed
  * the SAME cleaning + decimal-shift chain with ZERO exchanges — every
  * window in the chain partitions by a superset of `id`, so the bucket
  * scan's hash partitioning satisfies them all. At 100 TB this turns the
  * pipeline's one id-shuffle into none: bucket once at ingest, and every
  * re-run of the cleaning chain (daily, per-regime, backfills) is
  * exchange-free.
  */
class BucketedTradesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val bucketed = {
    val base = graft.Scratch.dirFor("bkt_trades", sf)
    Trades.df(spark, sf).write.mode("overwrite")
      .option("path", s"$base/trades")
      .bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bkt_trades")
    spark.table("graft_bkt_trades")
  }

  test("clean + decimal-shift chain over bucketed trades plans zero exchanges") {
    val chain = QTracePipeline.correctedDag(
      QTracePipeline.cleanedDagFrom(bucketed))
    val c = graft.Plans.planCounts(chain)
    // the single BroadcastExchange is DecimalShift's documented anchor
    // join-back — small side, no repartitioning of the trades
    assert(c.shuffles == 0,
      s"expected shuffle-free chain, got shuffles=${c.shuffles}")
    // the plain-scan path pays the id-shuffle the bucket layout removes
    val plain = QTracePipeline.correctedDag(
      QTracePipeline.cleanedDagFrom(Trades.df(spark, sf)))
    assert(graft.Plans.planCounts(plain).shuffles > 0)
  }

  test("bucketed chain output is identical to the plain-scan chain") {
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf)
    val viaBuckets = QTracePipeline.dailyPanelDag(
      QTracePipeline.correctedDag(QTracePipeline.cleanedDagFrom(bucketed)))
      .collect().map(key).toSet
    val viaPlain = QTracePipeline.dailyPanelDag(
      QTracePipeline.correctedDag(
        QTracePipeline.cleanedDagFrom(Trades.df(spark, sf))))
      .collect().map(key).toSet
    assert(viaBuckets == viaPlain && viaBuckets.nonEmpty)
  }
}
