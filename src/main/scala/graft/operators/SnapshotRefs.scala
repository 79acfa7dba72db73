package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named REFS over the snapshot log — branches and tags, the Iceberg
  * refs / Delta WAP (write–audit–publish) layer. A BRANCH is a mutable
  * named pointer to a snapshot that advances under the same CAS
  * discipline as the manifests themselves: the ref's history lives as
  * put-if-absent files `_refs/<name>/r<seq>.ref`, so two writers racing
  * to advance one branch cannot clobber each other — the loser's
  * hard-link fails and it must re-read the head (and, deriving from a
  * stale head, give up with OCC semantics). A TAG is an immutable named
  * pointer (`_refs/_tags/<name>.ref`, put-if-absent once) — release
  * pins that survive branch movement.
  *
  * Branch commits still mint GLOBAL snapshot versions (one linear id
  * space, exactly like Iceberg snapshot ids), so expiry, orphan sweeps
  * and time travel by id keep working; what makes a commit "on a
  * branch" is its `#parent` manifest header, which records the
  * snapshot it was derived from. Ancestry (`isAncestor`) walks those
  * headers — the basis of FAST-FORWARD publish: `main` may adopt an
  * audit branch's head only when its own head is an ancestor of it
  * (nothing committed to main meanwhile), which is exactly the
  * write–audit–publish contract — stage commits on a branch no reader
  * of `main` can see, validate them, then publish by moving a POINTER,
  * zero data movement at any table size.
  *
  * Scale shape: every operation here is metadata — a ref is one line,
  * ancestry is a header walk over manifests already in page cache, and
  * the publish step costs one hard link however many terabytes the
  * audited commits staged.
  */
object SnapshotRefs {

  private val ParentHeader = "#parent"

  private def checkName(name: String): Unit =
    require(name.nonEmpty &&
      name.forall(c => c.isLetterOrDigit || c == '-' || c == '.'),
      s"bad ref name: $name")

  private def refDir(tableDir: String, name: String) = {
    checkName(name)
    val p = Paths.get(tableDir, "_refs", name)
    Files.createDirectories(p)
    p
  }

  // tags live in a sibling namespace so a branch and a tag may share a
  // name without colliding on disk
  private def tagDir(tableDir: String, name: String) = {
    checkName(name)
    val p = Paths.get(tableDir, "_refs", "_tags", name)
    Files.createDirectories(p)
    p
  }

  /** the snapshot a manifest records as its parent (None for root
    * commits and for pre-parent manifests, which are their own
    * implicit chain — see [[isAncestor]]). Commit-level metadata, read
    * raw — [[SnapshotLog.headers]] deliberately excludes it so
    * carry-forward writers can never propagate a stale parent. */
  def parentOf(tableDir: String, v: Int): Option[Int] =
    SnapshotLog.parentOf(tableDir, v)

  private[graft] def parentHeader(v: Int): String = s"$ParentHeader\t$v"

  // ---- branches ----------------------------------------------------

  /** Create branch `name` pointing at snapshot `at`. Fails if the
    * branch already exists (CAS on r1). */
  def createBranch(tableDir: String, name: String, at: Int): Unit = {
    require(at >= 1, s"cannot branch at v$at")
    if (!putRef(refDir(tableDir, name), 1, at))
      throw new IllegalStateException(
        s"branch $name already exists at $tableDir")
  }

  /** does branch `name` exist at this table? */
  def branchExists(tableDir: String, name: String): Boolean =
    latestSeq(refDir(tableDir, name)) >= 1

  /** current head of branch `name`. */
  def head(tableDir: String, name: String): Int = {
    val d = refDir(tableDir, name)
    val seq = latestSeq(d)
    require(seq >= 1, s"no branch $name at $tableDir")
    new String(Files.readAllBytes(d.resolve(s"r$seq.ref")), UTF_8)
      .trim.toInt
  }

  private def latestSeq(d: java.nio.file.Path): Int = {
    val listing = Files.list(d)
    val seqs = try listing.toArray.toSeq.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .collect { case s if s.matches("r\\d+\\.ref") =>
        s.stripPrefix("r").stripSuffix(".ref").toInt }
    finally listing.close()
    if (seqs.isEmpty) 0 else seqs.max
  }

  private def putRef(d: java.nio.file.Path, seq: Int, v: Int): Boolean = {
    val tmp = d.resolve(
      s".r$seq.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, v.toString.getBytes(UTF_8))
    try { Files.createLink(d.resolve(s"r$seq.ref"), tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** CAS-advance branch `name` from `expectedHead` to `to`. Throws
    * [[java.util.ConcurrentModificationException]] if the branch moved
    * past `expectedHead` meanwhile — the caller derived from a stale
    * head and must re-read and re-derive (the OCC contract).
    */
  private[graft] def advance(tableDir: String, name: String,
      expectedHead: Int, to: Int): Unit = {
    val d = refDir(tableDir, name)
    val seq = latestSeq(d)
    val cur = head(tableDir, name)
    if (cur != expectedHead || !putRef(d, seq + 1, to))
      throw new java.util.ConcurrentModificationException(
        s"branch $name at $tableDir advanced past v$expectedHead")
  }

  /** APPEND `batch` as one commit on branch `name`: the rows land under
    * a writer-unique data root, the manifest carries every entry of the
    * branch head plus the new files (seq = the new snapshot id, parent =
    * the head), and the branch ref CAS-advances. Readers of OTHER refs
    * never see the commit — that is the "write" of write–audit–publish.
    * Returns the new snapshot id.
    */
  def commitAppend(s: SparkSession, tableDir: String, name: String,
      batch: DataFrame): Int = {
    val h = head(tableDir, name)
    val root = SnapshotLog.writerRoot(s"$tableDir/data/ref-$name")
    batch.write.mode("overwrite").parquet(root)
    // the GLOBAL id mint retries like any append (an interleaved commit
    // on another branch is not a logical conflict for an append — the
    // manifest derives from the BRANCH head, not from latest); the ref
    // advance below is the real OCC gate. Entries re-render per retry
    // because data-file seq must equal the committed version. O(delta):
    // the branch head's segment refs are adopted verbatim.
    var target = 0
    var attempts = 0
    while (target == 0) {
      attempts += 1
      require(attempts <= 1000,
        s"branch commit on $name lost 1000 id races; giving up")
      val t = SnapshotLog.latest(tableDir) + 1
      val added = SnapshotLog.dataFiles(root).map(f =>
        SnapshotLog.FileEntry(f, "D", s"ref=$name", Map.empty,
          seq = t.toLong, bytes = SnapshotLog.statBytes(f)))
      // the #ref staging marker keeps this commit OFF the default read
      // face until a fast-forward publishes it (WAP isolation)
      if (SnapshotLog.publishAppend(tableDir, t, h, added,
          extraHeaders =
            Seq(parentHeader(h), s"${SnapshotLog.RefHeader}\t$name")))
        target = t
    }
    advance(tableDir, name, h, target)
    target
  }

  /** is `anc` an ancestor of (or equal to) `desc`? Walks `#parent`
    * headers; manifests without one (the pre-refs linear history) fall
    * back to the implicit parent v-1, so a branch rooted on a linear
    * table still traces to its root. */
  def isAncestor(tableDir: String, anc: Int, desc: Int): Boolean = {
    var v = desc
    while (v >= 1) {
      if (v == anc) return true
      v = parentOf(tableDir, v).getOrElse(v - 1)
    }
    false
  }

  /** PUBLISH: fast-forward branch `name` to snapshot `to`. Requires the
    * current head to be an ancestor of `to` — audited commits built on
    * anything else (or a main that moved underneath the audit) refuse
    * rather than silently dropping history. Pointer move only: zero
    * data, zero manifests written.
    */
  def fastForward(tableDir: String, name: String, to: Int): Unit = {
    val h = head(tableDir, name)
    require(isAncestor(tableDir, h, to),
      s"cannot fast-forward $name: v$h is not an ancestor of v$to")
    advance(tableDir, name, h, to)
  }

  // ---- tags ----------------------------------------------------------

  /** Pin snapshot `v` under the immutable tag `name` — fails if the tag
    * exists (tags never move; delete-and-recreate is deliberately not
    * offered). */
  def tag(tableDir: String, name: String, v: Int): Unit = {
    require(v >= 1 && v <= SnapshotLog.latest(tableDir),
      s"cannot tag uncommitted v$v")
    if (!putRef(tagDir(tableDir, name), 1, v))
      throw new IllegalStateException(s"tag $name already exists")
  }

  /** the snapshot a tag pins. */
  def resolveTag(tableDir: String, name: String): Int = {
    val d = tagDir(tableDir, name)
    require(latestSeq(d) >= 1, s"no tag $name at $tableDir")
    new String(Files.readAllBytes(d.resolve("r1.ref")), UTF_8).trim.toInt
  }
}
