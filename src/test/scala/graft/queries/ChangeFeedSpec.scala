package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** Manifest-driven change feed (s37_change_feed) — the diff must
  * recover EXACTLY the CDC batch the merge applied, from the exclusive
  * files alone:
  *
  *  1. D ops == the planted delete keys; I ops == the planted inserts.
  *  2. U ops ⊆ the planted update keys (a key whose new signature
  *     happens to equal its old one is legitimately silent).
  *  3. Nothing outside the touched months appears — shared files
  *     contribute nothing, and the planner never even lists them.
  */
class ChangeFeedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("change feed recovers the planted CDC batch from exclusive files") {
    val dir = s"${graft.Scratch.dirFor("s37_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val src = SnapshotLog.read(spark, dir, v1).filter(col("m").isin(2, 3))
    val deletes = src.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val updates = src.filter(col("l_orderkey") % 19 =!= 0 &&
        col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        (col("l_orderkey") % 47 + 1).cast("int").as("new_qty"))
    val inserts = src.filter(col("l_orderkey") % 19 =!= 0 &&
        col("l_orderkey") % 13 =!= 0 && col("l_orderkey") % 17 === 0)
      .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
        col("l_linenumber"), col("qty"), col("m"))
    val v2 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes, updates, inserts,
      Map("qty" -> "new_qty"))

    // the exclusive sets name only touched-month files
    val (oldExc, newExc) = SnapshotLog.exclusiveEntries(dir, v1, v2)
    assert(oldExc.nonEmpty && newExc.nonEmpty)
    assert((oldExc ++ newExc).forall(e => Set("m=2", "m=3")(e.partition)),
      "an untouched partition leaked into the diff's read set")

    val cf = QFilters.changeFeed(spark, dir, v1, v2).persist()
    def keysOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
      df.select(col("l_orderkey"), col("l_linenumber"), col("m"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

    // 1. deletes and inserts recovered exactly
    assert(keysOf(cf.filter(col("op") === "D")) == keysOf(deletes))
    assert(keysOf(cf.filter(col("op") === "I")) == keysOf(inserts))
    // 2. updates: subset of the planted keys, silent only when the
    // signature truly didn't move
    val uGot = keysOf(cf.filter(col("op") === "U"))
    val uPlanted = keysOf(updates)
    assert(uGot.nonEmpty && uGot.subsetOf(uPlanted))
    val silent = uPlanted -- uGot
    if (silent.nonEmpty) {
      // every silent key's old qty sum must equal its new one
      val sigs = base.filter(col("m").isin(2, 3))
        .groupBy(col("l_orderkey"), col("l_linenumber"), col("m"))
        .agg(sum(col("qty")).cast("long").as("sq"),
          count(lit(1)).as("n"),
          sum((col("l_orderkey") % 47 + 1).cast("int")).cast("long")
            .as("sq_new"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
          ((r.getLong(3), r.getLong(5)))).toMap
      silent.foreach { k =>
        val (sqOld, sqNew) = sigs(k)
        assert(sqOld == sqNew, s"key $k silent but signature moved")
      }
    }
    // 3. everything sits in the touched months
    assert(keysOf(cf).forall(k => k._3 == 2 || k._3 == 3))
    cf.unpersist()

    // 4. under pure copy-on-write the effective-state diff degenerates
    // to the plain exclusive-path diff — same planner read set
    val (chO, chN) = SnapshotLog.changedEntries(dir, v1, v2)
    assert(chO.map(_.path).sorted == oldExc.map(_.path).sorted &&
      chN.map(_.path).sorted == newExc.map(_.path).sorted,
      "COW changedEntries must equal exclusiveEntries")
  }

  test("change feed over a MERGE-ON-READ delete commit (the s38 shape)") {
    val dir = s"${graft.Scratch.dirFor("s38_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val delKeys = SnapshotLog.read(spark, dir, v1)
      .filter(col("m").isin(2, 3) && col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v2 = graft.operators.DeleteVectors.appendDeletes(spark, dir, delKeys)

    // every data path is SHARED between v1 and v2 — the old
    // exclusive-path diff would see nothing; the effective-state diff
    // must recover exactly the planted keys as D ops
    val (oldExc, newExc) = SnapshotLog.exclusiveEntries(dir, v1, v2)
    assert(oldExc.isEmpty && newExc.isEmpty,
      "an appendDeletes transition must share every data path")
    val cf = QFilters.changeFeed(spark, dir, v1, v2)
    assert(cf.filter(col("op") =!= "D").count() == 0,
      "a delete-only commit must produce only D ops")
    val got = cf.select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val want = delKeys.distinct()
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "D ops must equal the vector's visible keys")

    // a compaction commit (v2→v3) rewrites every touched path but
    // changes NO logical row — the feed must come back empty
    val v3 = graft.operators.DeleteVectors.compact(spark, dir, "m")
    assert(QFilters.changeFeed(spark, dir, v2, v3).count() == 0,
      "compaction is a physical rewrite, not a logical change")
  }
}
