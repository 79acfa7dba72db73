package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The DSv2 connector's two scale claims, pinned: partition planning
  * (the row range splits into the requested input partitions) and
  * column pruning (the projection's pruned schema reaches the Scan —
  * the reader then computes only those columns).
  */
class Dsv2Spec extends SparkSpec {

  private def synth(rows: Long, parts: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).load()

  test("planner splits the row range into the requested partitions") {
    val df = synth(1000L, 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 1000L)
    // slices are disjoint and complete
    assert(df.agg(countDistinct(col("trade_id"))).head.getLong(0) == 1000L)
  }

  test("closed-form values match the spec table") {
    val r = synth(100L, 2).filter(col("trade_id") === 53L).head
    assert(r.getLong(1) == SynthTrades.cell(53, "entity_id"))
    assert(r.getLong(2) == SynthTrades.cell(53, "price_cents"))
    assert(r.getLong(3) == SynthTrades.cell(53, "qty"))
  }

  test("column pruning reaches the scan") {
    val df = synth(1000L, 4).select(col("price_cents"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("price_cents")),
      s"pruned read schema expected, got $scans")
  }
}
