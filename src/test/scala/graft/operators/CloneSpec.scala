package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone (s50). Claims pinned:
  *  - cloning writes ZERO data files under the clone's root (one
  *    manifest referencing the source);
  *  - the sides diverge independently — a clone-side COW merge leaves
  *    every source read byte-identical, and vice versa;
  *  - a clone-side VACUUM (expire) never deletes the source's files
  *    (the own-root rule), while the clone's OWN dead files do go;
  *  - cloning into a non-empty table fails loudly.
  */
class CloneSpec extends SparkSpec {

  test("zero-copy clone; divergence; vacuum respects the source") {
    import spark.implicits._
    val src = "/tmp/graft-test/clone-src/t"
    val dst = "/tmp/graft-test/clone-dst/t"
    graft.Scratch.clear("/tmp/graft-test/clone-src")
    graft.Scratch.clear("/tmp/graft-test/clone-dst")
    val base = (0L until 100L).map(i => (i, i % 4, i * 10))
      .toDF("id", "grp", "v")
    SnapshotMerge.writeInitial(spark, base, src, "grp")

    val v1 = SnapshotLog.clone(src, dst)
    assert(v1 == 1)
    assert(SnapshotLog.dataFiles(dst).isEmpty,
      "clone must not copy any data file")
    assert(SnapshotLog.read(spark, dst, 1).count() == 100)

    // diverge the clone: COW-merge away grp=2 (rewrites land under dst)
    val dels = SnapshotLog.read(spark, dst, 1).filter(col("grp") === 2)
      .select(col("id"), col("grp"))
    val v2 = SnapshotMerge(spark, dst, "grp", Seq("id"),
      dels, dels.limit(0).withColumn("nv", lit(0L)),
      base.limit(0), Map("v" -> "nv"))
    assert(SnapshotLog.read(spark, dst, v2).count() == 75)
    // the source never moved
    assert(SnapshotLog.read(spark, src, SnapshotLog.latest(src))
      .count() == 100)

    // vacuum the clone below v2: the only dead references are the
    // SOURCE's grp=2 files — foreign-rooted, so they must survive
    val srcFiles = SnapshotLog.dataFiles(src).toSet
    val deleted = SnapshotLog.expire(dst, keepFrom = v2)
    assert(deleted.forall(!srcFiles.contains(_)) &&
      srcFiles.forall(p => java.nio.file.Files.exists(
        java.nio.file.Paths.get(p))),
      s"clone vacuum reached into the source: $deleted")
    assert(SnapshotLog.read(spark, src, SnapshotLog.latest(src))
      .count() == 100)

    // a second clone into the now non-empty dst refuses
    intercept[IllegalArgumentException] {
      SnapshotLog.clone(src, dst)
    }
  }

  test("cloning a MULTI-COMMIT source continues its sequence numbering") {
    import spark.implicits._
    val src = "/tmp/graft-test/clone-seq-src/t"
    val dst = "/tmp/graft-test/clone-seq-dst/t"
    graft.Scratch.clear("/tmp/graft-test/clone-seq-src")
    graft.Scratch.clear("/tmp/graft-test/clone-seq-dst")
    val base = (0L until 60L).map(i => (i, i % 3, i * 10))
      .toDF("id", "grp", "v")
    SnapshotMerge.writeInitial(spark, base, src, "grp")
    // three appends: carried data seqs now reach 4
    (1 to 3).foreach { k =>
      SnapshotMerge.appendPartitioned(spark,
        (0L until 10L).map(i => (1000L * k + i, i % 3, i))
          .toDF("id", "grp", "v"), src, "grp")
    }
    assert(SnapshotLog.entries(src, SnapshotLog.latest(src))
      .map(_.seq).max == 4L)

    val v0 = SnapshotLog.clone(src, dst)
    assert(v0 >= 4,
      s"clone must land at or above the max carried seq, got v$v0")
    assert(SnapshotLog.read(spark, dst, v0).count() == 90)

    // a clone-side delete vector must cover EVERY carried file — with a
    // restarted counter its seq (2) would not exceed carried seqs 2..4
    // and the delete would silently not apply
    val del = SnapshotLog.read(spark, dst, v0)
      .filter(col("id") >= 3000L).select(col("id"), col("grp"))
    val v1 = DeleteVectors.appendDeletes(spark, dst, del)
    assert(SnapshotLog.readMor(spark, dst, v1).count() == 80,
      "clone-side vector must suppress carried rows from EVERY commit")
    // and a later re-insert on the clone is served, not suppressed
    val v2 = graft.streaming.SnapshotCommitSink.commitBatch(spark, dst,
      Seq((3001L, 1L, 1L)).toDF("id", "grp", "v"), 0L)
    assert(SnapshotLog.readMor(spark, dst, v2)
      .filter(col("id") === 3001L).count() == 1,
      "a re-inserted key must not be suppressed by the older vector")
    // the source never moved
    assert(SnapshotLog.read(spark, src, SnapshotLog.latest(src))
      .count() == 90)
  }
}
