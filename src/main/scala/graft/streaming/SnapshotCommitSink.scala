package graft.streaming

import graft.operators.SnapshotLog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming writer for a snapshot-log table — every micro-batch lands
  * as ONE committed snapshot (exactly-once at the table level): the
  * batch's files are written to a batchId-scoped directory, then a
  * manifest referencing all prior entries plus the new files publishes
  * through the CAS commit. The batchId is recorded as each new file's
  * partition label, which makes REPLAY idempotence a metadata check:
  * a restarted query re-delivering an already-committed epoch finds
  * its batchId in the current manifest and no-ops — the same
  * high-water-mark contract as the checksum sink's 2PC, here
  * expressed through the table format itself. Readers meanwhile pin
  * snapshots: an analyst query running against snapshot v is never
  * torn by the stream appending v+1.
  *
  * Scale shape: the commit adds one manifest line per file per epoch;
  * history cost is bounded by [[SnapshotLog.expire]] (the vacuum),
  * and a crashed epoch leaves only unreferenced files the next vacuum
  * sweeps.
  */
object SnapshotCommitSink {

  private def batchLabel(batchId: Long) = s"batch=$batchId"

  /** Commit one micro-batch as the next snapshot; no-op (returning the
    * current latest) if `batchId` is already committed — the replay
    * path after a restart.
    */
  def commitBatch(s: SparkSession, tableDir: String,
      batch: DataFrame, batchId: Long): Int = {
    val v = SnapshotLog.latest(tableDir)
    val prior = if (v > 0) SnapshotLog.entries(tableDir, v) else Nil
    if (prior.exists(_.partition == batchLabel(batchId))) return v
    val dir = s"$tableDir/data/b$batchId"
    batch.write.mode("overwrite").parquet(dir)
    // seq = the committing version: any delete vector already in the
    // manifest has a LOWER seq and therefore does NOT apply to these
    // rows — a key re-inserted by a later batch is served, not
    // silently suppressed by an older vector (the Iceberg
    // sequence-number scoping)
    val added = SnapshotLog.dataFiles(dir)
      .map(SnapshotLog.FileEntry(_, "D", batchLabel(batchId), Map.empty,
        seq = v + 1L))
    if (!SnapshotLog.publishEntries(tableDir, v + 1, prior ++ added,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during streaming commit " +
          s"of batch $batchId")
    v + 1
  }
}
