package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE composed WITH the snapshot log — copy-on-write all the way
  * down, so TIME TRAVEL spans upserts. Where [[MergeInto]] commits by
  * dynamic partition overwrite straight into the table directory
  * (mutating files out from under any previously published manifest),
  * this writer:
  *
  *  1. reads ONLY the touched partitions' files from the CURRENT
  *     manifest (partition labels live in the manifest, so pruning is
  *     a metadata filter — no directory walk, no footer read);
  *  2. applies the same three-way MERGE ([[MergeInto.threeWayApply]],
  *     shared so the two commit protocols cannot drift on semantics);
  *  3. writes the rewritten partitions to a NEW version-scoped
  *     directory (old files untouched on disk);
  *  4. commits a manifest that REFERENCES the untouched entries
  *     unchanged (file sharing between snapshots — the structural
  *     sharing that makes a 100 TB table's history affordable) plus
  *     the new files, each carrying its partition label and optional
  *     footer min/max stats (paid once here, at write).
  *
  * A reader pinned to the pre-merge snapshot still sees the pre-merge
  * table bit-for-bit; `s32_merge_snapshot` reads both sides against a
  * two-branch oracle and `SnapshotMergeSpec` pins the sharing.
  */
object SnapshotMerge {

  /** Hive-style partition dir segment for a value, e.g. "m=3". */
  private def partLabel(partCol: String, v: Any): String = s"$partCol=$v"

  /** Write `df` (which CONTAINS `partCol` as a normal column) as the
    * table's first snapshot: one partitioned write into a
    * version-scoped directory, one manifest entry per produced file
    * with its partition label (+ footer stats for `statsCols`).
    * The shadow `_gp` partition column keeps `partCol` IN the data
    * files, so snapshot reads over explicit file lists need no
    * partition inference.
    */
  def writeInitial(s: SparkSession, df: DataFrame, tableDir: String,
      partCol: String, statsCols: Seq[String] = Nil): Int = {
    val root = s"$tableDir/data/v1"
    df.withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(root)
    SnapshotLog.commitEntries(tableDir,
      collectEntries(s, root, partCol, statsCols))
  }

  /** Manifest entries for every parquet file under a version-scoped
    * partitioned write: partition label recovered from the `_gp=` dir,
    * stats from the parquet footer (write-side, once per file).
    */
  private def collectEntries(s: SparkSession, root: String,
      partCol: String, statsCols: Seq[String]): Seq[SnapshotLog.FileEntry] =
    SnapshotLog.dataFiles(root).map { f =>
      val seg = new java.io.File(f).getParentFile.getName
      require(seg.startsWith("_gp="), s"unexpected layout at $f")
      val label = s"$partCol=${seg.stripPrefix("_gp=")}"
      val stats =
        if (statsCols.isEmpty) Map.empty[String, (Long, Long)]
        else SnapshotLog.footerStats(s, f, statsCols)
      SnapshotLog.FileEntry(f, "D", label, stats)
    }

  /** Apply a CDC batch to the snapshot table at `tableDir` as a new
    * COMMITTED snapshot; returns the new snapshot id. Contract matches
    * [[MergeInto.apply]] (D/U/I frames, `newValues` coalesce map).
    * `fromVersion` pins the base snapshot the merge derives from
    * (default: current latest) — the OCC commit below only succeeds if
    * the table has not advanced past it.
    */
  def apply(s: SparkSession, tableDir: String, partCol: String,
      keyCols: Seq[String], deletes: DataFrame, updates: DataFrame,
      inserts: DataFrame, newValues: Map[String, String],
      statsCols: Seq[String] = Nil, fromVersion: Option[Int] = None): Int = {
    val v = fromVersion.getOrElse(SnapshotLog.latest(tableDir))
    val es = SnapshotLog.entries(tableDir, v)
    val touched = deletes.select(col(partCol))
      .unionByName(updates.select(col(partCol)))
      .unionByName(inserts.select(col(partCol)))
      .distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return v
    val touchedLabels = touched.map(partLabel(partCol, _)).toSet
    val dataEntries = es.filter(_.kind == "D")
    val (tEntries, uEntries) =
      dataEntries.partition(e => touchedLabels(e.partition))
    val curCols = SnapshotLog.read(s, tableDir, v).columns.toSeq
    val curRaw =
      if (tEntries.isEmpty)
        SnapshotLog.read(s, tableDir, v).filter(lit(false))
      else s.read.parquet(tEntries.map(_.path): _*)
        .select(curCols.map(col): _*)
    // a MERGE onto a VECTORED table applies the committed deletes
    // first (they logically precede the CDC batch) and implicitly
    // folds the touched partitions' vector keys — keys scoped to other
    // partitions survive as a residual vector (sound only when the
    // keys carry the partition column, like partition-scoped
    // compaction; enforced below)
    val delVectors = es.filter(_.kind == "X").map(_.path)
    val (cur, residualEntries) =
      if (delVectors.isEmpty) (curRaw, Nil)
      else {
        val vecKeys = s.read.parquet(delVectors: _*)
        require(vecKeys.columns.contains(partCol),
          s"MERGE onto a vectored table needs '$partCol' in the delete " +
            "keys (otherwise a key could target an untouched partition)")
        (curRaw.join(broadcast(vecKeys), vecKeys.columns.toSeq, "left_anti"),
          DeleteVectors.writeResidual(s, tableDir, v + 1, vecKeys,
            partCol, touched))
      }
    val merged = MergeInto.threeWayApply(
      cur, keyCols, deletes, updates, inserts, newValues)
    // copy-on-write: new files under a fresh version-scoped root — the
    // old files (and every manifest pointing at them) stay intact
    val newRoot = s"$tableDir/data/v${v + 1}"
    merged.withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(newRoot)
    // OCC commit: this merge was derived FROM snapshot v, so it may
    // only land AS v+1 — if a concurrent commit got there first, the
    // derived output is stale and the merge must fail-and-retry (the
    // Delta/Iceberg transaction-conflict rule), not land on a later id
    if (!SnapshotLog.publishEntries(tableDir, v + 1,
        uEntries ++ collectEntries(s, newRoot, partCol, statsCols) ++
          residualEntries))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during MERGE; re-run the merge")
    v + 1
  }
}
