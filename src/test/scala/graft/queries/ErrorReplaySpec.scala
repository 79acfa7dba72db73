package graft.queries

import graft.SparkSpec
import graft.operators.AuditedFilter
import org.apache.spark.sql.functions._

/** Flags and drops must tell the same story: the cascade counts derivable
  * from `tp_error_replay`'s flag-preserving row set reconcile exactly
  * with `AuditedFilter.ledger` over the same frame and stages (the
  * reference's inspection reports consume precisely this identity —
  * stage0/create_daily_enhanced_trace.py:2402-2780).
  */
class ErrorReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("replay flag cascade reconciles with the audit ledger") {
    val replay = graft.SparkEntry.queries("tp_error_replay")(spark, sf)
      .select("price_flag", "qty_flag", "bounce_flag").cache()
    try {
      val n = replay.count()
      assert(n > 0)
      // cascade identity: removed-at-stage-k = flagged at k AND clean at
      // every earlier stage (holds because the screen flags are pure
      // per-row predicates over the same frame the ledger filters)
      val agg = replay.agg(
        sum(col("price_flag")).as("p"),
        sum(when(col("price_flag") === 0 && col("qty_flag") === 1, 1L)
          .otherwise(0L)).as("q"),
        sum(when(col("price_flag") === 0 && col("qty_flag") === 0 &&
          col("bounce_flag") === 1, 1L).otherwise(0L)).as("b")).head
      val (pRem, qRem, bRem) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))

      val corr = QTracePipeline.corrected(spark, sf)
      val bounceDrop = graft.clean.BounceBack.flags(corr, "id", "ord", "price")
        .filter(col("filtered_error") === 1)
        .select(col("id"), col("ord"), lit(true).as("__bounced"))
      val ledger = AuditedFilter.ledger(
        corr.join(bounceDrop, Seq("id", "ord"), "left"),
        Seq(
          AuditedFilter.Stage("price_screen",
            col("price") >= 5 && col("price") <= 300),
          AuditedFilter.Stage("qty_screen", col("qty") <= 90),
          AuditedFilter.Stage("not_bounced", col("__bounced").isNull)))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

      assert(ledger("price_screen")._1 == n, "ledger base != replay rows")
      assert(ledger("price_screen")._3 == pRem,
        s"price removals: ledger ${ledger("price_screen")._3} vs flags $pRem")
      assert(ledger("qty_screen")._3 == qRem,
        s"qty removals: ledger ${ledger("qty_screen")._3} vs flags $qRem")
      assert(ledger("not_bounced")._3 == bRem,
        s"bounce removals: ledger ${ledger("not_bounced")._3} vs flags $bRem")
      // and the ledger's final survivor count equals rows with no flag in
      // the cascade's stages
      val cleanRows = replay.filter(col("price_flag") === 0 &&
        col("qty_flag") === 0 && col("bounce_flag") === 0).count()
      assert(ledger("not_bounced")._2 == cleanRows)
    } finally { replay.unpersist(); graft.Caches.clearAll() }
  }
}
