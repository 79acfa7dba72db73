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

  test("bin-packing OPTIMIZE: smalls coalesce, larges shared, labels kept") {
    import spark.implicits._
    val dir = "/tmp/graft-test/optimize-binpack/t"
    graft.Scratch.clear("/tmp/graft-test/optimize-binpack")
    // many SMALL files per partition (forced by pre-repartitioning) ...
    val smallDf = (0L until 2000L).map(i => (i, i % 4, i * 2))
      .toDF("id", "grp", "v").repartition(12)
    val v1 = SnapshotMerge.writeInitial(spark, smallDf, dir, "grp")
    // ... plus one LARGE appended batch per partition
    val bigDf = (100000L until 500000L).map(i => (i, i % 4, i))
      .toDF("id", "grp", "v").coalesce(2)
    val v2 = SnapshotMerge.appendPartitioned(spark, bigDf, dir, "grp")
    val threshold = 64L * 1024
    def sizeOf(p: String) =
      java.nio.file.Files.size(java.nio.file.Paths.get(p))
    val esBefore = SnapshotLog.entries(dir, v2)
    val bigBefore = esBefore.filter(e => sizeOf(e.path) >= threshold)
    assert(bigBefore.nonEmpty &&
      esBefore.size - bigBefore.size > 8, "fixture needs smalls + larges")
    val mtimes = bigBefore.map(e => e.path ->
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(e.path))).toMap

    val v3 = SnapshotOptimize.binPack(spark, dir, "grp", threshold,
      statsCols = Seq("id"))
    val esAfter = SnapshotLog.entries(dir, v3)
    // every pre-pack small file is gone from the manifest; per
    // partition at most ONE packed output remains under the threshold
    esAfter.groupBy(_.partition).foreach { case (p, g) =>
      assert(g.count(e => sizeOf(e.path) < threshold) <= 1,
        s"partition $p still holds multiple small files")
    }
    // untouched large entries shared verbatim: same paths, same mtimes
    assert(bigBefore.forall(e => esAfter.exists(_.path == e.path)),
      "bin-pack rewrote a large file")
    assert(mtimes.forall { case (p, t) =>
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)) == t })
    // labels preserved → partition-scoped merge still works
    assert(esAfter.forall(_.partition.startsWith("grp=")))
    // content identical; time travel serves the pre-pack layout
    def ids(v: Int) = SnapshotLog.read(spark, dir, v)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(col("id"))).head
    assert(ids(v3) == ids(v2))
    assert(SnapshotLog.entries(dir, v2).size == esBefore.size)
    // idempotent: nothing left to pack → no-op, no new snapshot
    assert(SnapshotOptimize.binPack(spark, dir, "grp", threshold) == v3)
  }

  test("binPack targetBytes: oversized partitions split into bounded bins") {
    import spark.implicits._
    val dir = "/tmp/graft-test/optimize-target/t"
    graft.Scratch.clear("/tmp/graft-test/optimize-target")
    // one partition with MANY small files whose total far exceeds the
    // target: without binning they would collapse into one big file
    val smallDf = (0L until 40000L).map(i => (i, i % 2, i * 3))
      .toDF("id", "grp", "v").repartition(16)
    SnapshotMerge.writeInitial(spark, smallDf, dir, "grp")
    def sizeOf(p: String) =
      java.nio.file.Files.size(java.nio.file.Paths.get(p))
    val es1 = SnapshotLog.entries(dir, SnapshotLog.latest(dir))
    val target = 56L * 1024
    val perPart = es1.groupBy(_.partition)
      .map { case (p, g) => p -> g.map(e => sizeOf(e.path)).sum }
    assert(perPart.values.forall(_ > 2 * target),
      s"fixture: each partition's smalls must exceed 2x target, " +
        s"got $perPart")
    val v2 = SnapshotOptimize.binPack(spark, dir, "grp",
      smallBytes = 10L * 1024 * 1024, statsCols = Seq("id"),
      targetBytes = Some(target))
    val es2 = SnapshotLog.entries(dir, v2)
    es2.groupBy(_.partition).foreach { case (p, g) =>
      assert(g.size >= 2,
        s"partition $p should split into >= 2 bins, got ${g.size}")
      // parquet re-encodes (often smaller); the bound is the bin's
      // INPUT bytes: target + one small file of slack
      g.foreach(e => assert(sizeOf(e.path) <= 2 * target,
        s"packed file ${e.path} is ${sizeOf(e.path)} bytes, " +
          s"target was $target"))
    }
    // content identical under the layout change
    def fact(v: Int) = SnapshotLog.read(spark, dir, v)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(col("id"))).head
    assert(fact(v2) == fact(1))
    // manifest-carried sizes made the small-file decision: entries
    // carry bytes, and the packed outputs recorded theirs
    assert(es2.forall(_.bytes >= 0L))
  }

  test("plan statistics come from manifest bytes — files deleted first") {
    import spark.implicits._
    val dir = "/tmp/graft-test/optimize-planstats/t"
    graft.Scratch.clear("/tmp/graft-test/optimize-planstats")
    val df = (0L until 5000L).map(i => (i, i % 3, i)).toDF("id", "grp", "v")
    // statsCols turns on the write-side stats pass → per-file ROW
    // counts in the manifest (bytes are recorded by every writer)
    SnapshotMerge.writeInitial(spark, df, dir, "grp",
      statsCols = Seq("id"))
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, 1).schema)
    val v = SnapshotLog.latest(dir)
    val es = SnapshotLog.entries(dir, v).filter(_.kind == "D")
    assert(es.forall(_.bytes > 0L), "writers must record bytes")
    val recorded = es.map(_.bytes).sum
    // the s33 trick applied to PLANNING: delete the data files, the
    // scan still reports the manifest-recorded size and row count
    es.foreach(e => java.nio.file.Files.delete(
      java.nio.file.Paths.get(e.path)))
    val rel = spark.read.format("graft-snapshot").option("path", dir)
      .load().queryExecution.optimizedPlan
    val stats = rel.stats
    assert(stats.sizeInBytes == BigInt(recorded),
      s"expected $recorded manifest bytes, got ${stats.sizeInBytes}")
    assert(stats.rowCount.contains(BigInt(5000)))
  }

  test("ZORDER WITHIN a partition column: labels survive, content " +
      "preserved, partition-scoped MERGE still composes") {
    import spark.implicits._
    val dir = "/tmp/graft-test/optimize-within/t"
    graft.Scratch.clear("/tmp/graft-test/optimize-within")
    val base = (0L until 3000L).map(i => (i, i % 3, i % 89))
      .toDF("id", "grp", "v")
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "grp")
    val v2 = SnapshotOptimize.zorder(spark, dir, Seq("id", "v"),
      nFiles = 6, withinPartCol = Some("grp"))

    val es2 = SnapshotLog.entries(dir, v2)
    assert(es2.forall(e => e.partition.startsWith("grp=")),
      s"labels dropped: ${es2.map(_.partition).distinct}")
    def rows(v: Int) = SnapshotLog.read(spark, dir, v)
      .select("id", "grp", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(rows(v2) == rows(v1), "within-partition optimize changed content")
    // stats still localize the curve's ranges within each partition
    // (few files per partition → assert on the dimension the curve
    // separates hardest here)
    val surv = es2.filter(e => e.kind == "D" && e.overlaps("v", 0L, 20L))
    assert(surv.nonEmpty && surv.size < es2.size,
      "per-partition z-stats must still prune a curve range")

    // the advice-item regression: a partition-scoped MERGE after the
    // optimize must WORK (labels intact), not fail the labeled-entry
    // requirement
    val dels = Seq((5L, 2L)).toDF("id", "grp")
    val ups = dels.filter(lit(false)).withColumn("nv", lit(0L))
    val ins = Seq((9005L, 2L, 7L)).toDF("id", "grp", "v")
    val v3 = SnapshotMerge(spark, dir, "grp", Seq("id"), dels, ups, ins,
      Map("v" -> "nv"))
    val after = SnapshotLog.read(spark, dir, v3)
    assert(after.filter(col("id") === 5L).count() == 0)
    assert(after.filter(col("id") === 9005L).count() == 1)
    assert(after.count() == 3000)
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
