package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletes for a snapshot-log table — the OTHER half of
  * the lake story next to [[SnapshotMerge]]'s copy-on-write: a delete
  * batch becomes an EQUALITY-DELETE file (a parquet file of key tuples,
  * Iceberg's equality deletes) committed as a manifest entry of kind
  * "X", and readers subtract it with a broadcast anti-join
  * ([[SnapshotLog.readMor]]). No data file is rewritten — the commit
  * cost is the delete batch itself, which is what a high-churn CDC
  * table needs when touched partitions are large (copy-on-write would
  * rewrite gigabytes to delete kilobytes). Every vector carries its
  * commit SEQUENCE and applies only to data committed strictly before
  * it (the Iceberg sequence-number rule) — re-inserting a deleted key
  * later is served, never suppressed. Compaction folds the vectors
  * away lazily: one rewrite job materializes the anti-join into fresh
  * data files and commits a vector-free snapshot, after which reads
  * pay zero merge cost again.
  *
  * POSITION deletes ([[appendPositionDeletes]], kind "P") are the
  * second tier — `(file_path, row_pos)` rows naming individual
  * physical rows, the Delta deletion-vector flavor: they can delete
  * one of two byte-identical duplicates, which no equality key can
  * express. Readers subtract them on the parquet `_metadata` row
  * index; compaction folds them exactly like equality vectors.
  *
  * Scale shape: the delete files of a snapshot are a day's churn —
  * broadcast-sized next to 100 TB of data; `readMor` broadcasts the
  * anti-joins over the scan, so the read plan stays scan →
  * broadcast-anti, no shuffle added. Compaction is the s22 job shape
  * (byte-bound rewrite), scheduled off-peak.
  */
object DeleteVectors {

  /** Commit `delKeys` (key-tuple rows) as an equality-delete file on
    * top of the current snapshot; returns the new snapshot id. OCC:
    * fails if a concurrent commit advanced the table first. The entry
    * is stamped with the commit's own sequence, so it covers exactly
    * the data that preceded it.
    */
  def appendDeletes(s: SparkSession, tableDir: String,
      delKeys: DataFrame): Int = {
    val v = SnapshotLog.latest(tableDir)
    val root = SnapshotLog.writerRoot(s"$tableDir/deletes/v${v + 1}")
    delKeys.distinct().coalesce(1).write.mode("overwrite").parquet(root)
    val delEntries = SnapshotLog.dataFiles(root)
      .map(f => SnapshotLog.FileEntry(f, "X", "", Map.empty,
        seq = v + 1L, bytes = SnapshotLog.statBytes(f)))
    if (!SnapshotLog.publishEntries(tableDir, v + 1,
        SnapshotLog.entries(tableDir, v) ++ delEntries,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during delete append")
    v + 1
  }

  /** Commit `pos` — rows of `(file_path, row_pos)` as produced by
    * [[positionsOf]] — as a POSITION-delete file; returns the new
    * snapshot id. Zero data files rewritten: deleting one physical
    * duplicate of a 100 TB table costs one tiny parquet file and a
    * manifest line.
    */
  def appendPositionDeletes(s: SparkSession, tableDir: String,
      pos: DataFrame): Int = {
    require(pos.columns.toSet == Set("file_path", "row_pos"),
      s"position deletes need exactly (file_path, row_pos); " +
        s"got ${pos.columns.mkString(",")}")
    val v = SnapshotLog.latest(tableDir)
    val root = SnapshotLog.writerRoot(s"$tableDir/deletes/v${v + 1}")
    pos.distinct().coalesce(1).write.mode("overwrite").parquet(root)
    val entries = SnapshotLog.dataFiles(root)
      .map(f => SnapshotLog.FileEntry(f, "P", "", Map.empty,
        seq = v + 1L, bytes = SnapshotLog.statBytes(f)))
    if (!SnapshotLog.publishEntries(tableDir, v + 1,
        SnapshotLog.entries(tableDir, v) ++ entries,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during position-delete append")
    v + 1
  }

  /** The `(file_path, row_pos)` address of every PHYSICAL row in
    * snapshot `v`'s data files matching `pred` — the planning step a
    * position delete starts from. Addresses come from the parquet
    * `_metadata` struct of the same scan a read plans, so they match
    * what [[SnapshotLog.readMor]] subtracts exactly.
    */
  def positionsOf(s: SparkSession, tableDir: String, v: Int,
      pred: Column): DataFrame =
    s.read.parquet(SnapshotLog.files(tableDir, v): _*)
      .select(col("*"),
        col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_pos"))
      .filter(pred)
      .select(col("file_path"), col("row_pos"))

  /** PARTITION-SCOPED compaction — fold the vectors into fresh files
    * for ONLY the listed partitions (the hot slice), sharing every
    * other data file by reference. Requires the equality-delete keys
    * to CARRY the partition column: the keys scoped to compacted
    * partitions are now materialized into the rewritten files and must
    * leave the vector, while keys targeting other partitions survive
    * as RESIDUAL delete files — one per source vector, each keeping
    * its ORIGINAL sequence, so the residual's scope never widens onto
    * data committed after the original delete. Position deletes are
    * folded into the rewrite and carried forward verbatim: a "P" row
    * naming a rewritten (now unreferenced) file is inert at read, one
    * naming a shared file still applies. This is what makes compaction
    * schedulable at 100 TB: fold where the churn is, never pay a
    * full-table rewrite (the un-scoped [[compact]] remains the
    * terminal OPTIMIZE).
    */
  def compactPartitions(s: SparkSession, tableDir: String, partCol: String,
      parts: Seq[Any], statsCols: Seq[String] = Nil): Int = {
    val v = SnapshotLog.latest(tableDir)
    val es = SnapshotLog.entries(tableDir, v)
    val vecEntries = es.filter(e => e.kind == "X" || e.kind == "P")
    require(vecEntries.nonEmpty, "no delete vectors to compact")
    es.filter(_.kind == "X").foreach { ve =>
      require(s.read.parquet(ve.path).columns.contains(partCol),
        s"partition-scoped compaction needs '$partCol' in the delete keys " +
          s"of ${ve.path} (otherwise a key could target an un-compacted " +
          "partition)")
    }
    val labels = parts.map(p => s"$partCol=$p").toSet
    val (tData, uData) = es.filter(_.kind == "D")
      .partition(e => labels(e.partition))
    require(tData.nonEmpty,
      s"no data entries match partitions ${parts.mkString(", ")} — " +
        "nothing to compact (typo'd value or already-compacted slice?)")
    val newRoot = SnapshotLog.writerRoot(s"$tableDir/data/v${v + 1}")
    // the touched slice's merge-on-read view, seq-scoped like any read
    SnapshotLog.morFrame(s, tableDir, v, tData ++ vecEntries)
      .withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(newRoot)
    val newData = SnapshotMerge.collectEntries(s, newRoot, partCol,
      statsCols, seq = v + 1L)
    val residualEntries = writeResidual(s, tableDir, v + 1,
      es.filter(_.kind == "X"), partCol, parts) ++ es.filter(_.kind == "P")
    if (!SnapshotLog.publishEntries(tableDir, v + 1,
        uData ++ newData ++ residualEntries,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during partial compaction")
    v + 1
  }

  /** The residual vectors left after folding the keys scoped to
    * `parts`: for EACH source vector, the keys targeting other
    * partitions, rewritten as the next version's delete file under the
    * source's ORIGINAL sequence (delete-batch-sized — an action over
    * metadata, not data). A key whose partition value is NULL cannot
    * belong to any listed partition, so it SURVIVES into the residual
    * (the `isin` null gap closed with a coalesce). Shared by
    * [[compactPartitions]] and [[SnapshotMerge]] (a MERGE implicitly
    * folds the touched partitions' vectors).
    */
  private[operators] def writeResidual(s: SparkSession, tableDir: String,
      nextV: Int, vecEntries: Seq[SnapshotLog.FileEntry], partCol: String,
      parts: Seq[Any]): Seq[SnapshotLog.FileEntry] =
    vecEntries.zipWithIndex.flatMap { case (ve, i) =>
      val keys = s.read.parquet(ve.path)
      val residual = keys
        .filter(coalesce(!col(partCol).isin(parts: _*), lit(true)))
        .localCheckpoint(true)
      if (residual.isEmpty) Nil
      else {
        val root = SnapshotLog.writerRoot(s"$tableDir/deletes/v${nextV}_r$i")
        residual.coalesce(1).write.mode("overwrite").parquet(root)
        SnapshotLog.dataFiles(root)
          .map(f => SnapshotLog.FileEntry(f, "X", "", Map.empty,
            seq = ve.seq, bytes = SnapshotLog.statBytes(f)))
      }
    }

  /** Fold the delete vectors away: materialize the merge-on-read view
    * into fresh data files (partition labels + optional stats carried
    * into the new manifest) and commit a snapshot with NO "X" or "P"
    * entries. Prior snapshots still read their exact (vectored) state.
    */
  def compact(s: SparkSession, tableDir: String, partCol: String,
      statsCols: Seq[String] = Nil): Int = {
    val v = SnapshotLog.latest(tableDir)
    val newRoot = SnapshotLog.writerRoot(s"$tableDir/data/v${v + 1}")
    SnapshotLog.readMor(s, tableDir, v)
      .withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(newRoot)
    val entries = SnapshotMerge.collectEntries(s, newRoot, partCol,
      statsCols, seq = v + 1L)
    if (!SnapshotLog.publishEntries(tableDir, v + 1, entries,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during compaction")
    v + 1
  }
}
