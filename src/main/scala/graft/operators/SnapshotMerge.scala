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
    val root = SnapshotLog.writerRoot(s"$tableDir/data/v1")
    df.withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(root)
    SnapshotLog.commitEntries(tableDir,
      collectEntries(s, root, partCol, statsCols, seq = 1L))
  }

  /** [[writeInitial]] under a MULTI-COLUMN partition spec: the table's
    * first snapshot is one partitioned write over ALL of `partCols`
    * (shadow `_gp0`, `_gp1`, … directories keep every column in the
    * data files), and each produced file is labeled
    * `a=1/b=2` — the ordered multi-segment label the scan's
    * storage-partitioned-join report, pruning and metadata grouping
    * all parse. This is the write door behind multi-key SPJ: two
    * tables written this way under the same spec join with zero
    * exchanges on the full key tuple.
    */
  def writeInitialMulti(s: SparkSession, df: DataFrame, tableDir: String,
      partCols: Seq[String], statsCols: Seq[String] = Nil): Int = {
    require(partCols.nonEmpty, "writeInitialMulti needs partCols")
    val root = SnapshotLog.writerRoot(s"$tableDir/data/v1")
    val shadows = partCols.indices.map(i => s"_gp$i")
    partCols.zip(shadows).foldLeft(df) { case (d, (c, sh)) =>
      d.withColumn(sh, col(c))
    }.write.partitionBy(shadows: _*).mode("overwrite").parquet(root)
    val files = SnapshotLog.dataFiles(root)
    val st =
      if (statsCols.isEmpty) Map.empty[String, SnapshotLog.FileStats]
      else SnapshotLog.collectFileStats(s, files, statsCols)
    val offs = SnapshotLog.collectSplitOffsets(s, files)
    SnapshotLog.commitEntries(tableDir, files.map { f =>
      val label = partCols.zip(shadows)
        .map { case (c, sh) => s"$c=${gpOf(f, s"$sh=")}" }
        .mkString("/")
      val fs = st.getOrElse(SnapshotLog.normPath(f),
        SnapshotLog.FileStats(-1L, Map.empty, Map.empty, Map.empty,
          Map.empty))
      SnapshotLog.FileEntry(f, "D", label, fs.longs, seq = 1L, fs.rows,
        fs.strs,
        bytes = java.nio.file.Files.size(java.nio.file.Paths.get(f)),
        nullCounts = fs.nulls, sums = fs.sums,
        splitOffsets = offs.getOrElse(SnapshotLog.normPath(f), Nil))
    })
  }

  /** APPEND `df` as one snapshot of partitioned, labeled files — the
    * writer a table uses after [[SnapshotLog.commitSpecChange]]: when
    * the manifest declares an active partition spec, `partCol` must
    * match it (mixed-label eras are how rows silently escape partition
    * pruning, so the mismatch fails loudly); files land under a
    * writer-unique root and the commit CAS-retries like any append.
    */
  def appendPartitioned(s: SparkSession, df: DataFrame, tableDir: String,
      partCol: String, statsCols: Seq[String] = Nil): Int = {
    SnapshotLog.specOf(tableDir, SnapshotLog.latest(tableDir)).foreach {
      spec => require(spec == partCol,
        s"active partition spec of $tableDir is $spec; " +
          s"appendPartitioned got $partCol")
    }
    val root = SnapshotLog.writerRoot(s"$tableDir/data/append")
    df.withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(root)
    // stats collected ONCE (a Spark job); the O(delta) append commit
    // re-stamps only the seq per CAS retry
    val base = collectEntries(s, root, partCol, statsCols, seq = 0L)
    SnapshotLog.appendEntries(tableDir,
      t => base.map(_.copy(seq = t.toLong)))
  }

  /** Manifest entries for every parquet file under a version-scoped
    * partitioned write: partition label recovered from the `_gp=` dir,
    * per-file row counts + min/max collected TASK-SIDE in one
    * distributed aggregation ([[SnapshotLog.collectFileStats]]) — the
    * commit path contains no per-file driver I/O loop.
    */
  private[operators] def collectEntries(s: SparkSession, root: String,
      partCol: String, statsCols: Seq[String],
      seq: Long): Seq[SnapshotLog.FileEntry] = {
    val files = SnapshotLog.dataFiles(root)
    // the stats pass (rows + min/max, one job) runs only when asked —
    // a stats-free writer stays a pure write; metaCount's loud
    // refusal covers tables that never recorded counts
    val st =
      if (statsCols.isEmpty) Map.empty[String, SnapshotLog.FileStats]
      else SnapshotLog.collectFileStats(s, files, statsCols)
    val offs = SnapshotLog.collectSplitOffsets(s, files)
    files.map { f =>
      // the label dir is the parent for a one-level partitioned write,
      // an ancestor when a sub-partition dir (a bin-pack's `_bin=`)
      // rides below it
      val label = s"$partCol=${gpOf(f)}"
      val fs = st.getOrElse(SnapshotLog.normPath(f),
        SnapshotLog.FileStats(-1L, Map.empty, Map.empty, Map.empty,
          Map.empty))
      // bytes: one stat per JUST-WRITTEN file — O(delta) at commit, so
      // plan-time consumers never stat the table (sizeOf reads these)
      SnapshotLog.FileEntry(f, "D", label, fs.longs, seq, fs.rows,
        fs.strs,
        bytes = java.nio.file.Files.size(java.nio.file.Paths.get(f)),
        nullCounts = fs.nulls, sums = fs.sums,
        splitOffsets = offs.getOrElse(SnapshotLog.normPath(f), Nil))
    }
  }

  /** the `<prefix><value>` ancestor dir's value for a written file
    * (prefix "_gp=" for the single-spec writer, "_gpN=" per column
    * for the multi-spec one). */
  private def gpOf(f: String, prefix: String = "_gp="): String = {
    var d = new java.io.File(f).getParentFile
    while (d != null && !d.getName.startsWith(prefix)) d = d.getParentFile
    require(d != null, s"unexpected layout at $f (no $prefix ancestor)")
    d.getName.stripPrefix(prefix)
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
    // the touched/untouched split below is a pure label comparison, so
    // it is only sound when EVERY data entry was labeled under EXACTLY
    // this partition column — a table mixing labeling conventions (a
    // streaming sink's "batch=N" entries, a multi-column spec's
    // "a=1/b=2" labels) could hide touched-partition rows inside an
    // "untouched" file and duplicate or resurrect them
    require(dataEntries.forall(e =>
        SnapshotLog.labelColsOf(e.partition) == Seq(partCol)),
      s"MERGE on '$partCol' needs every data entry labeled '$partCol=…'; " +
        s"found ${dataEntries.map(_.partition).distinct.filterNot(p =>
          SnapshotLog.labelColsOf(p) == Seq(partCol)).take(3)
          .mkString(", ")}")
    val (tEntries, uEntries) =
      dataEntries.partition(e => touchedLabels(e.partition))
    val curCols = SnapshotLog.read(s, tableDir, v).columns.toSeq
    // a MERGE onto a VECTORED table applies the committed deletes
    // first (they logically precede the CDC batch — the seq-scoped
    // merge-on-read view of the touched slice) and implicitly folds
    // the touched partitions' vector keys — keys scoped to other
    // partitions survive as residual vectors under their ORIGINAL
    // sequences (sound only when the keys carry the partition column,
    // like partition-scoped compaction; enforced below). Position-
    // delete entries are folded the same way and carried forward:
    // a "P" row naming a rewritten file is inert, one naming a shared
    // file still applies.
    val vecEntries = es.filter(e => e.kind == "X" || e.kind == "P")
    val cur =
      if (tEntries.isEmpty)
        SnapshotLog.read(s, tableDir, v).filter(lit(false))
      else SnapshotLog.morFrame(s, tableDir, v, tEntries ++ vecEntries)
        .select(curCols.map(col): _*)
    val residualEntries =
      if (vecEntries.isEmpty) Nil
      else {
        es.filter(_.kind == "X").foreach { ve =>
          require(s.read.parquet(ve.path).columns.contains(partCol),
            s"MERGE onto a vectored table needs '$partCol' in the delete " +
              s"keys of ${ve.path} (otherwise a key could target an " +
              "untouched partition)")
        }
        DeleteVectors.writeResidual(s, tableDir, v + 1,
          es.filter(_.kind == "X"), partCol, touched) ++
          es.filter(_.kind == "P")
      }
    val merged = MergeInto.threeWayApply(
      cur, keyCols, deletes, updates, inserts, newValues)
    // copy-on-write: new files under a fresh version-scoped root — the
    // old files (and every manifest pointing at them) stay intact
    val newRoot = SnapshotLog.writerRoot(s"$tableDir/data/v${v + 1}")
    merged.withColumn("_gp", col(partCol))
      .write.partitionBy("_gp").mode("overwrite").parquet(newRoot)
    val newEntries = collectEntries(s, newRoot, partCol, statsCols,
      seq = v + 1L)
    val hdrs = SnapshotLog.headers(tableDir, v)
    // OCC commit: this merge was derived FROM snapshot v, so it first
    // tries to land AS v+1. If a concurrent commit got there first the
    // derived output is stale IN GENERAL — but two writers touching
    // DISJOINT partitions are semantically serializable, so before
    // surfacing the conflict we attempt the Delta/Iceberg logical
    // REBASE: if every interleaved commit only added/removed files in
    // partitions disjoint from ours (and neither side involves delete
    // vectors, whose fold cannot be replayed from metadata alone), the
    // three-way apply is still exact — only the untouched-entry list
    // changed, so re-derive it from the new latest and retry. Any
    // overlap, vector, or label drift keeps the loud failure.
    if (SnapshotLog.publishEntries(tableDir, v + 1,
        uEntries ++ newEntries.map(_.copy(seq = v + 1L)) ++ residualEntries,
        hdrs))
      return v + 1
    rebase(s, tableDir, partCol, v, es, touchedLabels, newEntries, hdrs)
  }

  /** The disjoint-partition rebase loop after a lost OCC race: verify
    * from MANIFESTS ALONE that every commit interleaved since base `v`
    * is logically non-conflicting, then republish the already-written
    * merge output on top of the new latest. Pure metadata — the data
    * files written by the failed attempt are reused verbatim.
    */
  private def rebase(s: SparkSession, tableDir: String, partCol: String,
      v: Int, baseEs: Seq[SnapshotLog.FileEntry],
      touchedLabels: Set[String], newEntries: Seq[SnapshotLog.FileEntry],
      hdrs: Seq[String]): Int = {
    def conflict(msg: String) =
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during MERGE ($msg); " +
          "re-run the merge")
    if (baseEs.exists(_.kind != "D"))
      conflict("base snapshot carries delete vectors — fold not replayable")
    val basePaths = baseEs.map(_.path).toSet
    val MaxRetries = 100
    var attempt = 0
    while (attempt < MaxRetries) {
      val cur = SnapshotLog.latest(tableDir)
      val curEs = SnapshotLog.entries(tableDir, cur)
      if (curEs.exists(_.kind != "D"))
        conflict("an interleaved commit added delete vectors")
      if (SnapshotLog.headers(tableDir, cur) != hdrs)
        conflict("an interleaved commit changed the table schema")
      val curPaths = curEs.map(_.path).toSet
      val delta = curEs.filterNot(e => basePaths(e.path)) ++
        baseEs.filterNot(e => curPaths(e.path))
      delta.find(e => !e.partition.startsWith(s"$partCol=") ||
          touchedLabels(e.partition)) match {
        case Some(e) => conflict(
          s"interleaved commit touched '${e.partition}', " +
            s"overlapping this merge's partitions")
        case None => ()
      }
      // disjoint: our rewritten partitions are byte-identical at cur,
      // so the same output commits on top of cur's untouched entries
      val uNow = curEs.filterNot(e => touchedLabels(e.partition))
      if (SnapshotLog.publishEntries(tableDir, cur + 1,
          uNow ++ newEntries.map(_.copy(seq = cur + 1L)), hdrs))
        return cur + 1
      attempt += 1
    }
    conflict(s"lost $MaxRetries rebase races")
  }
}
