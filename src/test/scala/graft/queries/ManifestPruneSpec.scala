package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** Manifest-carried file stats (s33_manifest_prune) — the property that
  * separates it from the s18 zone maps: pruning is a PURE MANIFEST read.
  *
  *  1. The survivor set from manifest stats equals the footer-read
  *     planner's on the same range (same conservative-keep semantics).
  *  2. Plan-time metadata-ONLY: after physically DELETING every pruned
  *     file, the pruned read still answers correctly — if planning
  *     opened any pruned footer (as s18's planner must), it would throw.
  */
class ManifestPruneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("manifest pruning == footer pruning; survives deleting pruned files") {
    val dir = s"${graft.Scratch.dirFor("s33_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
        month(to_date(col("l_shipdate"))).as("m"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m",
      statsCols = Seq("l_orderkey"))
    val (lo, hi) = (1000L, 3000L)
    val es = SnapshotLog.entries(dir, v1)
    assert(es.forall(_.stats.contains("l_orderkey")),
      "every entry must carry write-time stats")
    val fromManifest = es.filter(_.overlaps("l_orderkey", lo, hi))
      .map(_.path).toSet
    assert(fromManifest.nonEmpty && fromManifest.size < es.size,
      s"range must actually prune (kept ${fromManifest.size}/${es.size})")

    // 1. same survivors as the footer-read planner, file by file
    val fromFooters = es.map(_.path).filter { p =>
      val st = SnapshotLog.footerStats(spark, p, Seq("l_orderkey"))
      st.get("l_orderkey").forall { case (mn, mx) => mx >= lo && mn <= hi }
    }.toSet
    assert(fromManifest == fromFooters,
      "manifest survivors diverged from footer survivors")

    val want = SnapshotLog.read(spark, dir, v1)
      .filter(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head

    // 2. delete every PRUNED file — pruning that read footers at plan
    // time would now throw; a manifest-only planner never notices
    es.map(_.path).filterNot(fromManifest).foreach { p =>
      assert(new java.io.File(p).delete(), s"couldn't delete $p")
    }
    val got = SnapshotLog.prunedRead(spark, dir, v1, "l_orderkey", lo, hi)
      .filter(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head
    assert(got == want,
      "metadata-pruned read diverged after pruned files were deleted")
  }

  test("stats survive a MERGE: the rewritten files carry fresh min/max") {
    val dir = s"${graft.Scratch.dirFor("s33_merge_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
        month(to_date(col("l_shipdate"))).as("m"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m",
      statsCols = Seq("l_orderkey"))
    val src = SnapshotLog.read(spark, dir, v1).filter(col("m").isin(2, 3))
    val deletes = src.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val emptyUpd = src.filter(lit(false))
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        col("qty").as("new_qty"))
    val inserts = src.filter(col("l_orderkey") % 19 =!= 0 &&
        col("l_orderkey") % 17 === 0)
      .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
        col("l_linenumber"), col("qty"), col("m"))
    val v2 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes, emptyUpd, inserts,
      Map("qty" -> "new_qty"), statsCols = Seq("l_orderkey"))
    // every v2 entry — shared AND rewritten — carries stats
    val e2 = SnapshotLog.entries(dir, v2)
    assert(e2.forall(_.stats.contains("l_orderkey")),
      "a merged file lost its manifest stats")
    // a range over the +1M insert keys prunes to rewritten files only,
    // and the pruned read equals the plain filtered read
    val lo = 1000000L
    val keep = e2.filter(_.overlaps("l_orderkey", lo, Long.MaxValue))
    assert(keep.nonEmpty && keep.size < e2.size)
    assert(keep.forall(_.path.contains("/data/v2/")),
      "an insert-range probe should touch only the rewritten files")
    val got = SnapshotLog.prunedRead(spark, dir, v2, "l_orderkey", lo,
        Long.MaxValue)
      .filter(col("l_orderkey") >= lo)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head
    val want = SnapshotLog.read(spark, dir, v2)
      .filter(col("l_orderkey") >= lo)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head
    assert(got == want)
  }

  test("pruned reads still apply delete vectors (no resurrection)") {
    val dir = s"${graft.Scratch.dirFor("s33_vec_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
        month(to_date(col("l_shipdate"))).as("m"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m",
      statsCols = Seq("l_orderkey"))
    val (lo, hi) = (1000L, 3000L)
    // delete keys INSIDE the probed range — a pruned read that skipped
    // the vectors would resurrect exactly these
    val keys = SnapshotLog.read(spark, dir, v1)
      .filter(col("l_orderkey").between(lo, hi) &&
        col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    assert(keys.count() > 0)
    val v2 = graft.operators.DeleteVectors.appendDeletes(spark, dir, keys)

    val got = SnapshotLog.prunedRead(spark, dir, v2, "l_orderkey", lo, hi)
      .filter(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head
    val want = SnapshotLog.readMor(spark, dir, v2)
      .filter(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head
    assert(got == want,
      "pruned == unpruned merge-on-read over a vectored table")
    assert(SnapshotLog.prunedRead(spark, dir, v2, "l_orderkey", lo, hi)
      .filter(col("l_orderkey") % 7 === 0 &&
        col("l_orderkey").between(lo, hi)).count() == 0,
      "a pruned read resurrected vector-deleted rows")
  }
}
