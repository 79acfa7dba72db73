package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One table, its whole life — the round-11 kernel features composed
  * end-to-end in commit order, each step's invariant pinned where it
  * happens:
  *
  *   v1 initial write → refs (main/maint branches + a release tag)
  *   → OPTIMIZE ZORDER audited on `maint`, fast-forwarded to `main`
  *   → plain DSv2 append (lineage stays correct — the #parent fix)
  *   → equality-delete vector (MOR read) → compaction (vector folds)
  *   → expiry (old versions gone LOUDLY, tag dangles loudly too)
  *   → metadata tables reflect exactly the retained history.
  */
class LakeLifecycleSpec extends SparkSpec {

  test("write → refs → optimize → append → delete → compact → expire") {
    import spark.implicits._
    val dir = "/tmp/graft-test/lifecycle/t"
    graft.Scratch.clear("/tmp/graft-test/lifecycle")
    val base = (0L until 2000L).map(i => (i, i % 4, i % 89))
      .toDF("id", "grp", "v")
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "grp")
    SnapshotRefs.createBranch(dir, "main", v1)
    SnapshotRefs.createBranch(dir, "maint", v1)
    SnapshotRefs.tag(dir, "rel", v1)

    // maintenance: optimize, audit on the maint ref, publish to main
    val v2 = SnapshotOptimize.zorder(spark, dir, Seq("id", "v"), nFiles = 4)
    SnapshotRefs.fastForward(dir, "maint", v2)
    def ids(v: Int) = SnapshotLog.readMor(spark, dir, v)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(SnapshotRefs.head(dir, "maint")) == ids(v1),
      "optimize must be content-preserving")          // the audit
    SnapshotRefs.fastForward(dir, "main", v2)

    // plain DSv2 append on the published head: lineage must hold
    (2000L until 2100L).map(i => (i, i % 4, i % 89))
      .toDF("id", "grp", "v")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    val v3 = SnapshotLog.latest(dir)
    assert(SnapshotRefs.parentOf(dir, v3).contains(v2))
    SnapshotRefs.fastForward(dir, "main", v3)

    // CDC: vector-delete the %13 slice, merge-on-read serves the rest
    val dels = SnapshotLog.readMor(spark, dir, v3)
      .filter(col("id") % 13 === 0).select(col("id"))
    val v4 = DeleteVectors.appendDeletes(spark, dir, dels)
    val expect = (0L until 2100L).filterNot(_ % 13 == 0)
    assert(ids(v4) == expect)

    // compaction folds the vector; content identical
    val v5 = DeleteVectors.compact(spark, dir, "grp")
    assert(ids(v5) == expect)
    assert(SnapshotLog.entries(dir, v5).forall(_.kind == "D"))

    // retention: drop everything below the compacted snapshot
    SnapshotLog.expire(dir, keepFrom = v5)
    assert(ids(v5) == expect, "retained snapshot torn by expiry")
    // expired time travel and the dangling tag both fail LOUDLY
    intercept[IllegalArgumentException] { SnapshotLog.read(spark, dir, v1) }
    intercept[IllegalArgumentException] {
      SnapshotLog.read(spark, dir, SnapshotRefs.resolveTag(dir, "rel"))
    }

    // the history table reflects exactly the retained manifests
    val meta = SnapshotLog.metaSnapshots(spark, dir)
      .select("version").collect().map(_.getInt(0)).sorted.toSeq
    assert(meta == Seq(v5), s"metadata table lists $meta")
  }
}
