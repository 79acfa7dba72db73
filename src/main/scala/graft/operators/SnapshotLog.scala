package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal snapshot log — the table-format kernel (Iceberg/Delta's
  * core idea) as an explicit operator: every COMMIT publishes an
  * immutable manifest (the file list that IS the table at that
  * version), readers pin a snapshot and see exactly its files, and a
  * copy-on-write rewrite commits a new manifest while the old files
  * stay on disk — so TIME TRAVEL is just "read an older manifest", and
  * concurrent readers of v1 are never torn by a v2 writer. Publish is
  * atomic temp+move (the ChecksumSink pattern): a crashed commit leaves
  * a `.tmp` that no reader resolves, never a partial manifest.
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
    val ids = Files.list(d).toArray.toSeq.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
    if (ids.isEmpty) 0 else ids.max
  }

  /** publish `files` as the next snapshot; returns its id. */
  def commit(tableDir: String, files: Seq[String]): Int = {
    val d = manifestDir(tableDir)
    val next = latest(tableDir) + 1
    val tmp = d.resolve(s".v$next.manifest.tmp")
    Files.write(tmp, files.sorted.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, d.resolve(s"v$next.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** the file list of snapshot `v` (immutable once committed). */
  def files(tableDir: String, v: Int): Seq[String] = {
    val m = manifestDir(tableDir).resolve(s"v$v.manifest")
    require(Files.exists(m), s"no snapshot v$v at $tableDir")
    new String(Files.readAllBytes(m), UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  /** read the table as of snapshot `v`. */
  def read(s: SparkSession, tableDir: String, v: Int): DataFrame =
    s.read.parquet(files(tableDir, v): _*)

  /** the data files a write just produced under `dir`. */
  def dataFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
  }
}
