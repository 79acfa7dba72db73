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

  test("trade_id range predicates push into the generator") {
    val df = synth(100000L, 8).filter(col("trade_id") >= 500L &&
      col("trade_id") < 600L)
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[SynthScan]
    }
    assert(scans.nonEmpty)
    assert(scans.head.lo == 500L && scans.head.hi == 600L,
      s"bounds not pushed: [${scans.head.lo}, ${scans.head.hi})")
    assert(df.count() == 100L)
    // contradiction collapses to the empty range, not an error
    assert(synth(1000L, 4).filter(col("trade_id") === 5L &&
      col("trade_id") === 7L).count() == 0L)
  }

  test("micro-batch stream drains the range in batchRows-sized batches") {
    import org.apache.spark.sql.streaming.Trigger
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-synth")
      .option("rows", 1000L).option("partitions", 3)
      .option("batchRows", 300L)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(b.count()); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batches.asScala.toSeq
    assert(sizes.sum == 1000L, s"lost/duplicated rows: $sizes")
    assert(sizes.count(_ > 0) >= 4, s"expected >=4 real micro-batches: $sizes")
    assert(sizes.forall(_ <= 300L), s"admission limit violated: $sizes")
  }

  test("checksum sink commits order-invariant folds; failures never publish") {
    import spark.implicits._
    val dir = graft.Scratch.dirFor("dsv2_sink_spec", "x")
    val manifest = s"$dir/manifest.json"
    def readManifest(): (Long, Long, Long) = {
      val r = spark.read.schema("n_rows LONG, sum_id LONG, xor_id LONG")
        .json(manifest).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val ids = (1L to 1000L)
    ids.toDF("id").repartition(7)
      .write.format("graft-checksum").option("path", manifest)
      .mode("append").save()
    val good = readManifest()
    assert(good == ((1000L, ids.sum, ids.foldLeft(0L)(_ ^ _))))
    // a write that fails mid-task must leave the manifest untouched
    val boom = udf((x: Long) =>
      if (x == 500L) throw new RuntimeException("boom") else x)
    intercept[Exception] {
      ids.toDF("id").repartition(7)
        .select(boom(col("id")).as("id"))
        .write.format("graft-checksum").option("path", manifest)
        .mode("append").save()
    }
    assert(readManifest() == good, "failed write clobbered the manifest")
    // overwrite mode must work: the advertised TRUNCATE capability is
    // backed by SupportsTruncate (no-op for this stateless sink — the
    // manifest is atomically replaced at commit either way)
    ids.take(10).toDF("id")
      .write.format("graft-checksum").option("path", manifest)
      .mode("overwrite").save()
    assert(readManifest() ==
      ((10L, (1L to 10L).sum, (1L to 10L).foldLeft(0L)(_ ^ _))))
  }

  test("replayed foreachBatch micro-batch is idempotent under per-batchId overwrite") {
    import spark.implicits._
    // foreachBatch is at-least-once: the sink contract used by
    // stream_dsv2_source / stream_sketch_census routes each batch to a
    // batchId-derived subdir with overwrite, so a replay rewrites
    // instead of double-appending — exactly-once OUTPUT from
    // at-least-once delivery
    val dir = graft.Scratch.dirFor("replay_spec", "x") + "/rows"
    graft.Scratch.clear(dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writeBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      batch.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    val b0 = (1L to 100L).toDF("v")
    writeBatch(b0, 0L)
    writeBatch((101L to 150L).toDF("v"), 1L)
    writeBatch(b0, 0L) // the replay
    val rows = spark.read.parquet(dir)
    assert(rows.count() == 150L, "replayed batch double-counted")
    assert(rows.agg(sum(col("v"))).head.getLong(0) == (1L to 150L).sum)
  }
}
