package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal snapshot log — the table-format kernel (Iceberg/Delta's
  * core idea) as an explicit operator: every COMMIT publishes an
  * immutable manifest (the file list that IS the table at that
  * version), readers pin a snapshot and see exactly its files, and a
  * copy-on-write rewrite commits a new manifest while the old files
  * stay on disk — so TIME TRAVEL is just "read an older manifest", and
  * concurrent readers of v1 are never torn by a v2 writer. Publish is
  * atomic PUT-IF-ABSENT (the Delta LogStore / Iceberg atomic-swap
  * contract): the manifest is staged to a committer-unique temp file
  * and published with an atomic hard link, which FAILS if the version
  * already exists — two racing committers that both computed
  * `latest()+1` cannot clobber each other; the loser re-reads latest
  * and retries onto the next id, so both commits survive under
  * distinct versions. A crashed commit leaves only a temp file that no
  * reader resolves, never a partial or torn manifest.
  *
  * Scale shape: the manifest is metadata (one path per file); snapshot
  * reads hand Spark an explicit file list, so planning cost is the
  * manifest size, not a directory walk, and nothing is ever rewritten
  * except the partitions a commit actually replaces (`s30`'s pruned
  * merge is the natural writer).
  */
object SnapshotLog {

  private def manifestDir(tableDir: String) = {
    val p = Paths.get(tableDir, "_manifests")
    Files.createDirectories(p)
    p
  }

  /** newest committed snapshot id, 0 if none. */
  def latest(tableDir: String): Int = {
    val d = manifestDir(tableDir)
    val listing = Files.list(d)
    val ids = try listing.toArray.toSeq.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
    finally listing.close() // Files.list holds a directory fd until closed
    if (ids.isEmpty) 0 else ids.max
  }

  /** Try to publish `files` as EXACTLY snapshot `v` — put-if-absent.
    * Stages the full manifest to a committer-unique temp file, then
    * publishes via `Files.createLink` (atomic on POSIX; throws
    * [[FileAlreadyExistsException]] if `v` is already committed).
    * Returns false on collision so the caller can re-read `latest()`
    * and retry — the compare-and-swap a table-format commit is made of.
    */
  private[graft] def publish(
      tableDir: String, v: Int, files: Seq[String]): Boolean = {
    val d = manifestDir(tableDir)
    val tmp = d.resolve(
      s".v$v.manifest.tmp-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, files.sorted.mkString("\n").getBytes(UTF_8))
    try { Files.createLink(d.resolve(s"v$v.manifest"), tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** publish `files` as the next snapshot; returns its id. Safe under
    * concurrent committers: a lost race surfaces as a failed
    * put-if-absent, never a clobbered manifest, and the commit retries
    * onto the then-next version (bounded — each retry means someone
    * else's commit SUCCEEDED, the standard progress argument).
    */
  def commit(tableDir: String, files: Seq[String]): Int = {
    val MaxRetries = 1000
    var attempt = 0
    while (attempt < MaxRetries) {
      val next = latest(tableDir) + 1
      if (publish(tableDir, next, files)) return next
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot commit at $tableDir lost $MaxRetries races; giving up")
  }

  /** One manifest row. `kind` is "D" (data) or "X" (equality-delete —
    * a parquet file of key tuples subtracted at read, the merge-on-read
    * half of the lake story). `partition` is the `col=value` label the
    * writer recorded ("" when unpartitioned) — it makes partition
    * pruning a pure manifest filter. `stats` carries per-file min/max
    * for INT64 columns (paid ONCE at write from the parquet footer),
    * so range pruning is a metadata read that never opens a footer at
    * plan time — the Iceberg/Delta manifest-stats design.
    */
  final case class FileEntry(
      path: String, kind: String, partition: String,
      stats: Map[String, (Long, Long)]) {
    def overlaps(colName: String, lo: Long, hi: Long): Boolean =
      stats.get(colName) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true // stats absent: conservative keep
      }
  }

  private def renderEntry(e: FileEntry): String = {
    val part = if (e.partition.isEmpty) "-" else e.partition
    val st =
      if (e.stats.isEmpty) "-"
      else e.stats.toSeq.sortBy(_._1)
        .map { case (c, (mn, mx)) => s"$c:$mn:$mx" }.mkString(",")
    s"${e.path}\t${e.kind}\t$part\t$st"
  }

  private def parseEntry(line: String): FileEntry =
    line.split("\t") match {
      case Array(p) => FileEntry(p, "D", "", Map.empty) // legacy: bare path
      case Array(p, k, part, st) =>
        val stats =
          if (st == "-") Map.empty[String, (Long, Long)]
          else st.split(",").map { s =>
            val Array(c, mn, mx) = s.split(":")
            c -> ((mn.toLong, mx.toLong))
          }.toMap
        FileEntry(p, k, if (part == "-") "" else part, stats)
      case _ => throw new IllegalStateException(s"bad manifest line: $line")
    }

  /** the typed file list of snapshot `v` (immutable once committed). */
  def entries(tableDir: String, v: Int): Seq[FileEntry] = {
    val m = manifestDir(tableDir).resolve(s"v$v.manifest")
    require(Files.exists(m), s"no snapshot v$v at $tableDir")
    new String(Files.readAllBytes(m), UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map(parseEntry)
  }

  /** publish typed entries as the next snapshot (same CAS commit). */
  def commitEntries(tableDir: String, es: Seq[FileEntry]): Int =
    commit(tableDir, es.map(renderEntry))

  /** put-if-absent for typed entries at a SPECIFIC version — the OCC
    * primitive snapshot transforms build on: a writer that derived its
    * output from snapshot v publishes at v+1 and must FAIL (not land on
    * a later id) if another commit got there first, because its result
    * no longer reflects the table it would replace.
    */
  private[graft] def publishEntries(
      tableDir: String, v: Int, es: Seq[FileEntry]): Boolean =
    publish(tableDir, v, es.map(renderEntry))

  /** the DATA file list of snapshot `v`. */
  def files(tableDir: String, v: Int): Seq[String] =
    entries(tableDir, v).filter(_.kind == "D").map(_.path)

  /** read the table as of snapshot `v` (data files only — see
    * [[readMor]] for delete-vector application). */
  def read(s: SparkSession, tableDir: String, v: Int): DataFrame =
    s.read.parquet(files(tableDir, v): _*)

  /** Merge-on-read: data files of snapshot `v` MINUS the keys in its
    * equality-delete files (anti-join on the delete files' own
    * columns — the reader consults the vectors, nothing is rewritten).
    * At scale the delete set is a day's churn — broadcast-sized next
    * to the data, and folded away lazily by compaction.
    */
  def readMor(s: SparkSession, tableDir: String, v: Int): DataFrame = {
    val es = entries(tableDir, v)
    val data = s.read.parquet(es.filter(_.kind == "D").map(_.path): _*)
    val dels = es.filter(_.kind == "X").map(_.path)
    if (dels.isEmpty) data
    else {
      // no distinct here: anti-join semantics ignore right-side
      // duplicates (appendDeletes already dedupes at write), and a
      // distinct would add a shuffle to every vectored read
      val delKeys = s.read.parquet(dels: _*)
      data.join(
        org.apache.spark.sql.functions.broadcast(delKeys),
        delKeys.columns.toSeq, "left_anti")
    }
  }

  /** Metadata-only range pruning: keep snapshot `v`'s data files whose
    * manifest-carried [min, max] on `colName` overlaps [lo, hi] — a
    * pure string read of the manifest; no parquet footer is opened at
    * plan time (the spec proves it by DELETING the pruned files first).
    * Falls back to all files for entries without stats.
    */
  def prunedRead(s: SparkSession, tableDir: String, v: Int,
      colName: String, lo: Long, hi: Long): DataFrame = {
    val keep = entries(tableDir, v)
      .filter(e => e.kind == "D" && e.overlaps(colName, lo, hi))
    if (keep.isEmpty)
      read(s, tableDir, v).filter(org.apache.spark.sql.functions.lit(false))
    else s.read.parquet(keep.map(_.path): _*)
  }

  /** The CHANGE-FEED planning step: the data entries exclusive to each
    * of two snapshots (old-only, new-only). Structural sharing makes
    * this the entire cost model of a snapshot diff — SHARED files
    * cannot contribute changes (same path ⇒ same bytes ⇒ same rows),
    * so a change feed reads only the partitions a commit actually
    * rewrote, however large the table. A pure manifest set difference;
    * no file is opened here.
    */
  def exclusiveEntries(tableDir: String, vOld: Int, vNew: Int)
      : (Seq[FileEntry], Seq[FileEntry]) = {
    val o = entries(tableDir, vOld).filter(_.kind == "D")
    val n = entries(tableDir, vNew).filter(_.kind == "D")
    val oPaths = o.map(_.path).toSet
    val nPaths = n.map(_.path).toSet
    (o.filterNot(e => nPaths(e.path)), n.filterNot(e => oPaths(e.path)))
  }

  /** Expire snapshots below `keepFrom` — the VACUUM half of the
    * lifecycle (Delta VACUUM / Iceberg expireSnapshots): delete the
    * expired manifests and every file they reference that NO retained
    * snapshot still references. Structural sharing makes this a set
    * difference over manifest lines (pure metadata); retained
    * snapshots keep reading byte-identical because a shared file is by
    * construction in the retained set. Returns the deleted data files.
    * Time travel below `keepFrom` fails loudly afterwards (the
    * manifest is gone), never silently serves partial data.
    */
  def expire(tableDir: String, keepFrom: Int): Seq[String] = {
    val last = latest(tableDir)
    require(keepFrom >= 1 && keepFrom <= last,
      s"keepFrom $keepFrom outside committed range [1, $last]")
    val d = manifestDir(tableDir)
    def live(v: Int) = Files.exists(d.resolve(s"v$v.manifest"))
    val retained = (keepFrom to last).filter(live)
      .flatMap(v => entries(tableDir, v).map(_.path)).toSet
    val expired = (1 until keepFrom).filter(live)
    val dead = expired.flatMap(v => entries(tableDir, v).map(_.path))
      .distinct.filterNot(retained)
    dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
    expired.foreach(v => Files.delete(d.resolve(s"v$v.manifest")))
    dead
  }

  /** Per-file min/max of INT64 columns from the parquet FOOTER —
    * row-group stats folded per file. Paid once at WRITE time by the
    * committing writer (files·cols metadata, the Iceberg writer-side
    * stats collection); readers then prune from the manifest alone.
    */
  def footerStats(s: SparkSession, path: String, cols: Seq[String])
      : Map[String, (Long, Long)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    try {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      cols.flatMap { c =>
        val perBlock = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == c)
            .map(_.getStatistics)
            .collect { case st if st != null && st.hasNonNullValue =>
              (st.genericGetMin, st.genericGetMax) }
            .collect { case (mn: java.lang.Long, mx: java.lang.Long) =>
              (mn.longValue, mx.longValue) }
        }
        if (perBlock.isEmpty) None
        else Some(c -> ((perBlock.map(_._1).min, perBlock.map(_._2).max)))
      }.toMap
    } finally reader.close()
  }

  /** the data files a write just produced under `dir`. */
  def dataFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
  }
}
