package graft.streaming

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** Streaming snapshot commits (stream_snapshot_commit) — the contracts
  * that make the sink exactly-once at the table level:
  *
  *  1. One snapshot per epoch, history = the stream's prefix sums.
  *  2. REPLAY of an already-committed epoch is a no-op: same latest,
  *     same manifest bytes, even if the replayed frame differs (the
  *     restart-after-commit race).
  *  3. A crashed epoch (files written, commit never published) is
  *     invisible to every reader and to the replay check.
  */
class SnapshotStreamSpec extends SparkSpec {

  test("per-epoch commits; replay no-ops; crashed epoch invisible") {
    import spark.implicits._
    val dir = s"${graft.Scratch.dirFor("snapstream_spec", "x")}/t"
    graft.Scratch.clear(dir)
    val b0 = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "cents")
    val b1 = Seq((1L, 5L)).toDF("user_id", "cents")

    assert(SnapshotCommitSink.commitBatch(spark, dir, b0, 0L) == 1)
    assert(SnapshotCommitSink.commitBatch(spark, dir, b1, 1L) == 2)
    def total(v: Int): (Long, Long) = {
      val r = SnapshotLog.read(spark, dir, v)
        .agg(count(lit(1)), sum(col("cents"))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(total(1) == ((2L, 30L)) && total(2) == ((3L, 35L)))

    // 2. replaying epoch 0 — even with DIFFERENT content (the frame a
    // restarted source would rebuild) — must not advance the table
    val m2 = java.nio.file.Paths.get(dir, "_manifests", "v2.manifest")
    val m2Bytes = java.nio.file.Files.readAllBytes(m2).toSeq
    val replayed = SnapshotCommitSink.commitBatch(spark, dir,
      Seq((9L, 999L)).toDF("user_id", "cents"), 0L)
    assert(replayed == 2, "replayed epoch must return the current latest")
    assert(SnapshotLog.latest(dir) == 2)
    assert(java.nio.file.Files.readAllBytes(m2).toSeq == m2Bytes)
    assert(total(2) == ((3L, 35L)))

    // 3. a crashed epoch: files on disk, no commit — invisible
    Seq((7L, 70L)).toDF("user_id", "cents")
      .write.mode("overwrite").parquet(s"$dir/data/b9")
    assert(SnapshotLog.latest(dir) == 2)
    assert(total(2) == ((3L, 35L)))
    // and the NEXT real epoch commits cleanly past it
    assert(SnapshotCommitSink.commitBatch(spark, dir, b1, 2L) == 3)
    assert(total(3) == ((4L, 40L)))
  }

  test("upsert batches: last writer wins, re-insert served, replay no-op") {
    import spark.implicits._
    val dir = s"${graft.Scratch.dirFor("snapupsert_spec", "x")}/t"
    graft.Scratch.clear(dir)
    def state(v: Int): Map[Long, Long] =
      SnapshotLog.readMor(spark, dir, v).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // epoch 0: three fresh keys
    val v1 = SnapshotCommitSink.upsertBatch(spark, dir,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("user_id", "cents"),
      0L, Seq("user_id"))
    assert(v1 == 1 && state(1) == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))

    // epoch 1: update key 1, insert key 4 — keys 2,3 untouched
    val v2 = SnapshotCommitSink.upsertBatch(spark, dir,
      Seq((1L, 11L), (4L, 40L)).toDF("user_id", "cents"),
      1L, Seq("user_id"))
    assert(state(v2) == Map(1L -> 11L, 2L -> 20L, 3L -> 30L, 4L -> 40L))

    // epoch 2: RE-UPSERT key 1 again — the seq rule must serve the
    // epoch-2 row, not let epoch 1's vector suppress it
    val v3 = SnapshotCommitSink.upsertBatch(spark, dir,
      Seq((1L, 12L)).toDF("user_id", "cents"), 2L, Seq("user_id"))
    assert(state(v3) == Map(1L -> 12L, 2L -> 20L, 3L -> 30L, 4L -> 40L))

    // time travel: v2 still serves the epoch-1 value for key 1
    assert(state(v2)(1L) == 11L)

    // replayed epoch no-ops even with different content
    assert(SnapshotCommitSink.upsertBatch(spark, dir,
      Seq((1L, 999L)).toDF("user_id", "cents"), 1L, Seq("user_id")) == v3)
    assert(state(v3)(1L) == 12L)
  }
}
