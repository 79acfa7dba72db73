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
