package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPTIMIZE ZORDER as a snapshot commit (s51). Claims pinned:
  *  - the rewrite is CONTENT-PRESERVING (exact multiset equality);
  *  - the optimized manifest's stats localize a box predicate: the
  *    range read's survivor set is a STRICT SUBSET of the file list,
  *    while the pre-optimize layout (clustered on another key) keeps
  *    every file;
  *  - time travel still serves the pre-optimize layout;
  *  - a vectored snapshot refuses the optimize.
  */
class OptimizeSpec extends SparkSpec {

  test("content-preserving; stats localize; time travel intact") {
    import spark.implicits._
    val dir = "/tmp/graft-test/optimize/t"
    graft.Scratch.clear("/tmp/graft-test/optimize")
    // rows clustered by grp (the "month" layout): each grp-file spans
    // the FULL id range, so an id-range predicate can prune nothing
    val base = (0L until 4000L).map(i => (i, i % 4, i % 97))
      .toDF("id", "grp", "v")
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "grp")
    val v2 = SnapshotOptimize.zorder(spark, dir, Seq("id", "v"),
      nFiles = 8)

    def rows(v: Int) = SnapshotLog.read(spark, dir, v)
      .select("id", "grp", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(rows(v2) == rows(v1), "optimize changed the table's content")

    // manifest-stats pruning: the id range [0, 499] survives few
    // optimized files, but EVERY v1 file (no stats → conservative keep)
    val es2 = SnapshotLog.entries(dir, v2)
    val survivors2 = es2.filter(e =>
      e.kind == "D" && e.overlaps("id", 0L, 499L))
    assert(survivors2.nonEmpty && survivors2.size < es2.size,
      s"optimized stats pruned nothing: ${survivors2.size}/${es2.size}")
    val got = SnapshotLog.prunedRead(spark, dir, v2, "id", 0L, 499L)
      .filter(col("id") < 500).count()
    assert(got == 500)

    // time travel: v1 still serves the old layout byte-identically
    assert(SnapshotLog.read(spark, dir, v1).count() == 4000)

    // vectored snapshots refuse
    DeleteVectors.appendDeletes(spark, dir,
      Seq((1L, 1L)).toDF("id", "grp"))
    intercept[IllegalArgumentException] {
      SnapshotOptimize.zorder(spark, dir, Seq("id", "v"), nFiles = 4)
    }
  }

  test("an all-null z-dimension fails loudly, not with an NPE") {
    import spark.implicits._
    val dir = "/tmp/graft-test/optimize-null/t"
    graft.Scratch.clear("/tmp/graft-test/optimize-null")
    val df = (0L until 20L)
      .map(i => (i, i % 2, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "grp", "dead")
    SnapshotMerge.writeInitial(spark, df, dir, "grp")
    val e = intercept[IllegalArgumentException] {
      SnapshotOptimize.zorder(spark, dir, Seq("id", "dead"), nFiles = 4)
    }
    assert(e.getMessage.contains("no non-null values"),
      s"expected the loud all-null guard, got: ${e.getMessage}")
  }
}
