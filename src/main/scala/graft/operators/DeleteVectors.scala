package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletes for a snapshot-log table — the OTHER half of
  * the lake story next to [[SnapshotMerge]]'s copy-on-write: a delete
  * batch becomes an EQUALITY-DELETE file (a parquet file of key tuples,
  * Iceberg's equality deletes) committed as a manifest entry of kind
  * "X", and readers subtract it with a broadcast anti-join
  * ([[SnapshotLog.readMor]]). No data file is rewritten — the commit
  * cost is the delete batch itself, which is what a high-churn CDC
  * table needs when touched partitions are large (copy-on-write would
  * rewrite gigabytes to delete kilobytes). Compaction folds the
  * vectors away lazily: one rewrite job materializes the anti-join
  * into fresh data files and commits a vector-free snapshot, after
  * which reads pay zero merge cost again.
  *
  * Scale shape: the delete files of a snapshot are a day's churn —
  * broadcast-sized next to 100 TB of data; `readMor` distincts them
  * and broadcasts ONE anti-join over the scan, so the read plan stays
  * scan → broadcast-anti, no shuffle added. Compaction is the s22 job
  * shape (byte-bound rewrite), scheduled off-peak.
  */
object DeleteVectors {

  /** Commit `delKeys` (key-tuple rows) as an equality-delete file on
    * top of the current snapshot; returns the new snapshot id. OCC:
    * fails if a concurrent commit advanced the table first.
    */
  def appendDeletes(s: SparkSession, tableDir: String,
      delKeys: DataFrame): Int = {
    val v = SnapshotLog.latest(tableDir)
    val root = s"$tableDir/deletes/v${v + 1}"
    delKeys.distinct().coalesce(1).write.mode("overwrite").parquet(root)
    val delEntries = SnapshotLog.dataFiles(root)
      .map(SnapshotLog.FileEntry(_, "X", "", Map.empty))
    if (!SnapshotLog.publishEntries(tableDir, v + 1,
        SnapshotLog.entries(tableDir, v) ++ delEntries))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during delete append")
    v + 1
  }

  /** PARTITION-SCOPED compaction — fold the vectors into fresh files
    * for ONLY the listed partitions (the hot slice), sharing every
    * other data file by reference. Requires the delete keys to CARRY
    * the partition column: the keys scoped to compacted partitions are
    * now materialized into the rewritten files and must leave the
    * vector, while keys targeting other partitions survive as a
    * RESIDUAL delete file that readers keep applying (it cannot touch
    * the compacted rows — their partition values are outside its key
    * set). This is what makes compaction schedulable at 100 TB: fold
    * where the churn is, never pay a full-table rewrite (the
    * un-scoped [[compact]] remains the terminal OPTIMIZE).
    */
  def compactPartitions(s: SparkSession, tableDir: String, partCol: String,
      parts: Seq[Any], statsCols: Seq[String] = Nil): Int = {
    val v = SnapshotLog.latest(tableDir)
    val es = SnapshotLog.entries(tableDir, v)
    val delPaths = es.filter(_.kind == "X").map(_.path)
    require(delPaths.nonEmpty, "no delete vectors to compact")
    val delKeys = s.read.parquet(delPaths: _*)
    require(delKeys.columns.contains(partCol),
      s"partition-scoped compaction needs '$partCol' in the delete keys " +
        "(otherwise a key could target an un-compacted partition)")
    val labels = parts.map(p => s"$partCol=$p").toSet
    val (tData, uData) = es.filter(_.kind == "D")
      .partition(e => labels(e.partition))
    val newRoot = s"$tableDir/data/v${v + 1}"
    s.read.parquet(tData.map(_.path): _*)
      .join(broadcast(delKeys), delKeys.columns.toSeq, "left_anti")
      .withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(newRoot)
    val newData = SnapshotLog.dataFiles(newRoot).map { f =>
      val seg = new java.io.File(f).getParentFile.getName
      val stats =
        if (statsCols.isEmpty) Map.empty[String, (Long, Long)]
        else SnapshotLog.footerStats(s, f, statsCols)
      SnapshotLog.FileEntry(f, "D",
        s"$partCol=${seg.stripPrefix("_gp=")}", stats)
    }
    val residualEntries =
      writeResidual(s, tableDir, v + 1, delKeys, partCol, parts)
    if (!SnapshotLog.publishEntries(tableDir, v + 1,
        uData ++ newData ++ residualEntries))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during partial compaction")
    v + 1
  }

  /** The residual vector left after folding the keys scoped to
    * `parts`: keys targeting other partitions, rewritten as the next
    * version's delete file (delete-batch-sized — an action over
    * metadata, not data). Shared by [[compactPartitions]] and
    * [[SnapshotMerge]] (a MERGE implicitly folds the touched
    * partitions' vectors).
    */
  private[operators] def writeResidual(s: SparkSession, tableDir: String,
      nextV: Int, delKeys: DataFrame, partCol: String,
      parts: Seq[Any]): Seq[SnapshotLog.FileEntry] = {
    val residual = delKeys.filter(!col(partCol).isin(parts: _*))
      .localCheckpoint(true)
    if (residual.isEmpty) Nil
    else {
      val root = s"$tableDir/deletes/v$nextV"
      residual.coalesce(1).write.mode("overwrite").parquet(root)
      SnapshotLog.dataFiles(root)
        .map(SnapshotLog.FileEntry(_, "X", "", Map.empty))
    }
  }

  /** Fold the delete vectors away: materialize the merge-on-read view
    * into fresh data files (partition labels + optional stats carried
    * into the new manifest) and commit a snapshot with NO "X" entries.
    * Prior snapshots still read their exact (vectored) state.
    */
  def compact(s: SparkSession, tableDir: String, partCol: String,
      statsCols: Seq[String] = Nil): Int = {
    val v = SnapshotLog.latest(tableDir)
    val newRoot = s"$tableDir/data/v${v + 1}"
    SnapshotLog.readMor(s, tableDir, v)
      .withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(newRoot)
    val entries = SnapshotLog.dataFiles(newRoot).map { f =>
      val seg = new java.io.File(f).getParentFile.getName
      val label = s"$partCol=${seg.stripPrefix("_gp=")}"
      val stats =
        if (statsCols.isEmpty) Map.empty[String, (Long, Long)]
        else SnapshotLog.footerStats(s, f, statsCols)
      SnapshotLog.FileEntry(f, "D", label, stats)
    }
    if (!SnapshotLog.publishEntries(tableDir, v + 1, entries))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during compaction")
    v + 1
  }
}
