package graft.sources

import graft.SparkSpec
import graft.operators.{SnapshotLog, SnapshotRefs}
import org.apache.spark.sql.functions._

/** The graft-snapshot DSv2 WRITE face. Claims pinned:
  *  - an append through the plain DataFrame writer commits ONE
  *    snapshot; a second append a second — and the first version's
  *    content is unchanged by the second (snapshot isolation);
  *  - files on disk WITHOUT a manifest are invisible to every read and
  *    are swept by the orphan sweep (the two-phase-commit contract);
  *  - `option("branch", ...)` stages the write on a ref: main's head
  *    and content untouched until fast-forward; the branch/tag read
  *    options resolve the same snapshots;
  *  - null values and all supported column types round-trip.
  */
class SnapshotWriteSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val dir = s"/tmp/graft-test/snapwrite-$tag"
    graft.Scratch.clear(dir)
    dir
  }

  test("appends commit one snapshot each; versions isolated") {
    import spark.implicits._
    val dir = fresh("append")
    Seq((1L, "a", 1.5, true), (2L, "b", 2.5, false))
      .toDF("id", "s", "x", "f")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    assert(SnapshotLog.latest(dir) == 1)
    Seq((3L, null.asInstanceOf[String], 3.5, true))
      .toDF("id", "s", "x", "f")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    assert(SnapshotLog.latest(dir) == 2)

    def ids(v: Int) = SnapshotLog.read(spark, dir, v)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) == Seq(1L, 2L))
    assert(ids(2) == Seq(1L, 2L, 3L))
    // nulls and types round-trip through the DSv2 source too
    val r = spark.read.format("graft-snapshot").option("path", dir)
      .load().filter(col("id") === 3L).head
    assert(r.isNullAt(r.fieldIndex("s")) && r.getAs[Double]("x") == 3.5)
  }

  test("unreferenced files invisible; orphan sweep collects them") {
    import spark.implicits._
    val dir = fresh("orphan")
    Seq((1L, 10L)).toDF("id", "v")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    // a crashed write: files under a writer root, no manifest
    Seq((99L, 990L)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/data/append/w-crashed")
    assert(SnapshotLog.latest(dir) == 1)
    assert(SnapshotLog.read(spark, dir, 1).count() == 1)
    // an in-contract sweep (default cutoff) must SKIP the fresh files —
    // they look exactly like a concurrent writer's staged-not-yet-
    // published commit
    assert(SnapshotLog.removeOrphans(dir).isEmpty,
      "the age-guarded sweep deleted files inside the in-flight window")
    val swept = SnapshotLog.removeOrphans(dir, olderThanMillis = 0L)
    assert(swept.exists(_.contains("w-crashed")), s"swept: $swept")
    assert(SnapshotLog.read(spark, dir, 1).count() == 1)
  }

  test("branch-targeted writes stage; refs address reads") {
    import spark.implicits._
    val dir = fresh("branch")
    Seq((1L, 10L)).toDF("id", "v")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    SnapshotRefs.createBranch(dir, "main", 1)
    SnapshotRefs.createBranch(dir, "stage", 1)
    SnapshotRefs.tag(dir, "pin", 1)

    Seq((2L, 20L)).toDF("id", "v")
      .write.format("graft-snapshot").option("path", dir)
      .option("branch", "stage").mode("append").save()

    def refCount(opt: (String, String)) =
      spark.read.format("graft-snapshot").option("path", dir)
        .option(opt._1, opt._2).load().count()
    assert(refCount("branch" -> "main") == 1)
    assert(refCount("branch" -> "stage") == 2)
    assert(refCount("tagAsOf" -> "pin") == 1)
    assert(SnapshotRefs.head(dir, "main") == 1)
    // WAP isolation at the READ DOOR: the staged commit minted a global
    // snapshot id, but an UNPINNED read (and a timestamp read at the
    // staged commit's own stamp) must keep serving the published line
    val defCount = spark.read.format("graft-snapshot")
      .option("path", dir).load().count()
    assert(defCount == 1,
      s"default read served a branch-staged commit ($defCount rows)")
    val stagedTs = SnapshotLog.tsOf(dir, SnapshotLog.latest(dir)).get
    val tsCount = spark.read.format("graft-snapshot").option("path", dir)
      .option("timestampAsOf", stagedTs.toString).load().count()
    assert(tsCount == 1,
      s"TIMESTAMP AS OF served a branch-staged commit ($tsCount rows)")

    SnapshotRefs.fastForward(dir, "main",
      SnapshotRefs.head(dir, "stage"))
    assert(refCount("branch" -> "main") == 2)
    assert(refCount("tagAsOf" -> "pin") == 1)
    // ... and the fast-forward PUBLISHES it to the default face
    assert(spark.read.format("graft-snapshot").option("path", dir)
      .load().count() == 2,
      "default read must serve the branch commit once published")

    // a PLAIN (non-branch) append on top of the published branch head
    // records the head as ITS parent — not a stale carried pointer —
    // so the ref can fast-forward onto it (the ancestry-corruption
    // case headers()'s #parent exclusion exists for)
    Seq((3L, 30L)).toDF("id", "v")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    val tip = graft.operators.SnapshotLog.latest(dir)
    assert(SnapshotRefs.parentOf(dir, tip)
      .contains(SnapshotRefs.head(dir, "main")))
    SnapshotRefs.fastForward(dir, "main", tip)
    assert(refCount("branch" -> "main") == 3)
    // at most one addressing option per read
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").option("path", dir)
        .option("branch", "main").option("versionAsOf", "1").load()
        .count()
    }
  }
}
