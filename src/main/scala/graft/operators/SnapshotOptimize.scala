package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `OPTIMIZE ZORDER BY` as a SNAPSHOT COMMIT — the Delta/Iceberg
  * maintenance job composed from the engine's own parts: rewrite the
  * table's data clustered on the z-order of `dims` (each dimension
  * normalized through its table min/max into the curve's bit budget,
  * exactly what a real OPTIMIZE clusters on), and publish the result
  * as ONE content-preserving snapshot whose manifest carries fresh
  * per-file min/max on the z-columns. After the commit a box predicate
  * prunes from the MANIFEST ([[SnapshotLog.prunedRead]]) to the small
  * file subset the curve localized — no footer opened at plan time —
  * while time travel still serves the pre-optimize layout under its
  * own version. OCC publish at base+1: an interleaved commit fails the
  * optimize loudly (it is a re-runnable maintenance job), never
  * clobbers it; the orphaned rewrite directory is swept by
  * [[SnapshotLog.removeOrphans]].
  *
  * Scale shape: the rewrite is byte-bound by design (s22's cost
  * model — schedulable off-peak); everything else is metadata. The
  * one-table-agg min/max pass is the same stats collection every
  * OPTIMIZE implementation pays.
  *
  * LAYOUT CONTRACT: the default z-curve clusters ACROSS partitions,
  * so the rewritten entries carry no partition label — after a global
  * ZORDER the table prunes by the curve's stats, not by `col=value`
  * labels, and partition-scoped MERGE/compaction refuse it (their
  * label split would be unsound) until a `writeInitial`
  * re-partitions. Pass `withinPartCol` to keep the table's
  * partitioning instead: the curve then clusters WITHIN each
  * partition (Delta's `OPTIMIZE WHERE ... ZORDER BY` shape), every
  * rewritten entry keeps its label, and partition-scoped MERGE keeps
  * composing. The pure small-file job is [[binPack]].
  */
object SnapshotOptimize {

  def zorder(s: SparkSession, tableDir: String, dims: Seq[String],
      nFiles: Int, bits: Int = 16,
      withinPartCol: Option[String] = None): Int = {
    val v = SnapshotLog.latest(tableDir)
    val es = SnapshotLog.entries(tableDir, v)
    require(es.forall(_.kind == "D"),
      s"snapshot v$v of $tableDir carries delete vectors — compact " +
        "before OPTIMIZE (a clustering rewrite must not resurrect rows)")
    val df = SnapshotLog.read(s, tableDir, v)
    val aggs = dims.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val mmRow = df.agg(aggs.head, aggs.tail: _*).head()
    dims.zipWithIndex.foreach { case (c, i) =>
      require(!mmRow.isNullAt(2 * i) && !mmRow.isNullAt(2 * i + 1),
        s"OPTIMIZE ZORDER: dimension '$c' has no non-null values " +
          "(empty table or all-null column) — nothing to cluster on")
    }
    val zDims = dims.zipWithIndex.map { case (c, i) =>
      ZOrder.bucketed(c, mmRow.getLong(2 * i), mmRow.getLong(2 * i + 1),
        bits)
    }
    val root = SnapshotLog.writerRoot(s"$tableDir/data/optimize")
    val zed = df.withColumn("_z", ZOrder.zValue(zDims, bits))
    val rewritten = withinPartCol match {
      case None =>
        // GLOBAL curve: cluster across partitions, labels dropped
        zed.repartitionByRange(nFiles, col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
          .write.mode("overwrite").parquet(root)
        val files = SnapshotLog.dataFiles(root)
        // stats + row counts fold task-side in ONE distributed agg —
        // no per-file driver footer loop on a 10k-file rewrite
        val st = SnapshotLog.collectFileStats(s, files, dims)
        val offs = SnapshotLog.collectSplitOffsets(s, files)
        files.map { f =>
          val fs = st.getOrElse(SnapshotLog.normPath(f),
            SnapshotLog.FileStats(-1L, Map.empty, Map.empty, Map.empty,
              Map.empty))
          SnapshotLog.FileEntry(f, "D", "", fs.longs, seq = v + 1L,
            fs.rows, fs.strs, bytes = SnapshotLog.statBytes(f),
            nullCounts = fs.nulls, sums = fs.sums,
            splitOffsets = offs.getOrElse(SnapshotLog.normPath(f), Nil))
        }
      case Some(pc) =>
        // PARTITION-SCOPED curve (Delta's OPTIMIZE WHERE … ZORDER BY
        // shape): range-partition on (partition, z) so each task's
        // slice is label-contiguous and z-sorted, write Hive-layout,
        // recover every label — partition-scoped MERGE keeps working
        es.foreach(e => require(e.partition.startsWith(s"$pc="),
          s"ZORDER within '$pc' needs every entry labeled '$pc=…'; " +
            s"found '${e.partition}' at ${e.path}"))
        zed.withColumn("_gp", col(pc))
          .repartitionByRange(nFiles, col("_gp"), col("_z"))
          .sortWithinPartitions("_gp", "_z")
          .drop("_z")
          .write.partitionBy("_gp").mode("overwrite").parquet(root)
        SnapshotMerge.collectEntries(s, root, pc, dims, seq = v + 1L)
    }
    if (!SnapshotLog.publishEntries(tableDir, v + 1, rewritten,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during OPTIMIZE; re-run")
    v + 1
  }

  /** Plain BIN-PACKING `OPTIMIZE` as a snapshot commit — the everyday
    * maintenance job (Delta `OPTIMIZE` without ZORDER): coalesce ONLY
    * the small files (the s17 planner's decision — under `smallBytes`,
    * ≥ 2 per partition so there is something to pack), one rewrite per
    * touched partition, and publish a snapshot that SHARES every other
    * entry by reference — the untouched big files keep their paths,
    * mtimes and manifest stats verbatim, so the commit's write cost is
    * the small-file bytes, never the table. Partition labels are
    * PRESERVED (the rewrite stays inside each partition), so
    * partition-scoped MERGE keeps working — the label-dropping
    * trade-off is [[zorder]]'s alone. Time travel serves the
    * pre-optimize layout; OCC publish fails loudly on interleave.
    *
    * Scale shape: the small-file scan reads sizes from the MANIFEST
    * ([[SnapshotLog.sizeOf]] — zero filesystem stats on a
    * bytes-carrying table); the rewrite reads exactly the packed
    * files. At 100 TB this is the job that keeps a streaming-ingested
    * table's file count bounded without ever paying a table rewrite.
    *
    * `targetBytes` caps each packed OUTPUT file: inside each partition
    * the small files are binned by running-sum-div-target (the s17
    * planner's binning), one output file per bin — a partition with
    * thousands of tiny files never collapses into one arbitrarily
    * large file (Delta's OPTIMIZE target-size behavior). Default: one
    * bin per partition (no cap).
    */
  def binPack(s: SparkSession, tableDir: String, partCol: String,
      smallBytes: Long, statsCols: Seq[String] = Nil,
      targetBytes: Option[Long] = None): Int = {
    val v = SnapshotLog.latest(tableDir)
    val es = SnapshotLog.entries(tableDir, v)
    require(es.forall(_.kind == "D"),
      s"snapshot v$v of $tableDir carries delete vectors — compact " +
        "before OPTIMIZE (a packing rewrite must not resurrect rows)")
    val small = es.filter(e => SnapshotLog.sizeOf(e) < smallBytes)
    small.foreach(e => require(e.partition.startsWith(s"$partCol="),
      s"bin-packing on '$partCol' needs every small entry labeled " +
        s"'$partCol=…'; found '${e.partition}' at ${e.path}"))
    val packable = small.groupBy(_.partition).filter(_._2.size >= 2)
    if (packable.isEmpty) return v // nothing to pack: no-op, no commit
    val touched = packable.values.flatten.toSeq
    val touchedPaths = touched.map(_.path).toSet
    val untouched = es.filterNot(e => touchedPaths(e.path))
    val root = SnapshotLog.writerRoot(s"$tableDir/data/binpack")
    // per-partition BIN assignment from manifest sizes alone: files in
    // path order, bin = floor(cumulative-input-bytes / target) — each
    // bin's input totals ~target, so each output file respects the cap
    val target = targetBytes.getOrElse(Long.MaxValue)
    require(target > 0, s"targetBytes must be positive; got $target")
    val binOf: Seq[(String, String, Int)] =
      packable.toSeq.flatMap { case (lbl, g) =>
        var cum = 0L
        g.sortBy(_.path).map { e =>
          val b = (cum / target).toInt
          cum += SnapshotLog.sizeOf(e)
          (e.path, lbl, b)
        }
      }
    val nBins = binOf.map(t => (t._2, t._3)).distinct.size
    // one read of exactly the packed files; the (partition, bin) combo
    // rides as write-partition columns, so each combo lands in its own
    // directory — hash co-location per combo makes it ONE output file
    import s.implicits._
    val bins = binOf.map(t => (t._1, t._3)).toDF("_path", "_bin")
    val data = s.read.parquet(touched.map(_.path): _*)
      .withColumn("_gp", col(partCol))
      .withColumn("_p", SnapshotLog.normPathCol(col("_metadata.file_path")))
    // LOUD path-spelling check BEFORE the bin join: if any scanned
    // file's metadata path fails to match its manifest spelling (an
    // exotic table directory the normalizer does not canonicalize),
    // the inner join below would silently drop that file's rows and
    // commit the loss — refuse instead. One distinct over the
    // file-path metadata column: file-count-sized, never row-heavy.
    val scanned = data.select(col("_p")).distinct()
      .collect().map(_.getString(0)).toSet
    val known = binOf.map(t => SnapshotLog.normPath(t._1)).toSet
    require(scanned.subsetOf(known),
      s"bin-pack: scanned file(s) matched no manifest entry (path " +
        s"normalization mismatch, e.g. " +
        s"${(scanned -- known).take(2).mkString(", ")}); refusing a " +
        "lossy rewrite")
    data.join(org.apache.spark.sql.functions.broadcast(
        bins.withColumn("_path", SnapshotLog.normPathCol(col("_path")))),
        data("_p") === col("_path"))
      .drop("_p", "_path")
      .repartition(nBins, col("_gp"), col("_bin"))
      .write.partitionBy("_gp", "_bin").mode("overwrite").parquet(root)
    val packed = SnapshotMerge.collectEntries(s, root, partCol,
      statsCols, seq = v + 1L)
    if (!SnapshotLog.publishEntries(tableDir, v + 1, untouched ++ packed,
        SnapshotLog.headers(tableDir, v)))
      throw new java.util.ConcurrentModificationException(
        s"snapshot $tableDir advanced past v$v during OPTIMIZE; re-run")
    v + 1
  }
}
