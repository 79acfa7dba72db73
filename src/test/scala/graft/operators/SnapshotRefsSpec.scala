package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Branches, tags and the write–audit–publish flow over the snapshot
  * log. Claims pinned:
  *  - commits on a branch are INVISIBLE to other refs until published;
  *  - fast-forward requires ancestry (a moved main refuses the publish);
  *  - a branch CAS rejects advances derived from a stale head;
  *  - tags are immutable and survive branch movement;
  *  - the published table is byte-identical to the branch the audit ran
  *    on (pointer move, zero data).
  */
class SnapshotRefsSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    val dir = s"/tmp/graft-test/refs-$tag"
    graft.Scratch.clear(dir)
    val base = spark.range(0, 100)
      .select(col("id"), (col("id") % 7).as("grp"))
    SnapshotMerge.writeInitial(spark, base, dir, "grp")
    dir
  }

  test("WAP: staged commits invisible, publish is a pointer move") {
    val dir = freshTable("wap")
    SnapshotRefs.createBranch(dir, "main", 1)
    SnapshotRefs.createBranch(dir, "audit", 1)
    SnapshotRefs.tag(dir, "rel-1", 1)

    val b2 = spark.range(100, 150)
      .select(col("id"), (col("id") % 7).as("grp"))
    val v2 = SnapshotRefs.commitAppend(spark, dir, "audit", b2)
    val b3 = spark.range(150, 180)
      .select(col("id"), (col("id") % 7).as("grp"))
    val v3 = SnapshotRefs.commitAppend(spark, dir, "audit", b3)

    // write: main and the tag still read the original 100 rows
    assert(SnapshotRefs.head(dir, "main") == 1)
    assert(SnapshotLog.read(spark, dir,
      SnapshotRefs.head(dir, "main")).count() == 100)
    assert(SnapshotLog.read(spark, dir,
      SnapshotRefs.resolveTag(dir, "rel-1")).count() == 100)
    // audit sees the staged world
    assert(SnapshotLog.read(spark, dir,
      SnapshotRefs.head(dir, "audit")).count() == 180)

    // audit passes → publish; main now reads the branch head's snapshot
    SnapshotRefs.fastForward(dir, "main", v3)
    assert(SnapshotRefs.head(dir, "main") == v3)
    assert(SnapshotLog.read(spark, dir, v3).count() == 180)
    // the tag did not move
    assert(SnapshotRefs.resolveTag(dir, "rel-1") == 1)
    assert(SnapshotRefs.isAncestor(dir, v2, v3))
    assert(!SnapshotRefs.isAncestor(dir, v3, v2))
  }

  test("fast-forward refuses a non-descendant head") {
    val dir = freshTable("ffwd")
    SnapshotRefs.createBranch(dir, "main", 1)
    SnapshotRefs.createBranch(dir, "audit", 1)
    val b = spark.range(100, 120)
      .select(col("id"), (col("id") % 7).as("grp"))
    val vAudit = SnapshotRefs.commitAppend(spark, dir, "audit", b)
    // main moves independently → the audit head no longer descends
    // from main's head, so publishing it would drop main's commit
    val vMain = SnapshotRefs.commitAppend(spark, dir, "main",
      spark.range(200, 210).select(col("id"), (col("id") % 7).as("grp")))
    assert(vMain != vAudit)
    intercept[IllegalArgumentException] {
      SnapshotRefs.fastForward(dir, "main", vAudit)
    }
    // audit itself can still fast-forward onto its own head (no-op path)
    SnapshotRefs.fastForward(dir, "audit", vAudit)
  }

  test("branch CAS rejects a commit derived from a stale head") {
    val dir = freshTable("stale")
    SnapshotRefs.createBranch(dir, "b", 1)
    val add = spark.range(100, 110)
      .select(col("id"), (col("id") % 7).as("grp"))
    SnapshotRefs.commitAppend(spark, dir, "b", add)
    // simulate the loser of a race: an advance whose expected head is
    // stale (the branch already sits past v1) must be rejected
    intercept[java.util.ConcurrentModificationException] {
      SnapshotRefs.advance(dir, "b", expectedHead = 1, to = 99)
    }
  }

  test("tags are immutable; duplicate branch creation fails") {
    val dir = freshTable("tags")
    SnapshotRefs.tag(dir, "pin", 1)
    intercept[IllegalStateException] { SnapshotRefs.tag(dir, "pin", 1) }
    SnapshotRefs.createBranch(dir, "m", 1)
    intercept[IllegalStateException] {
      SnapshotRefs.createBranch(dir, "m", 1)
    }
  }
}
