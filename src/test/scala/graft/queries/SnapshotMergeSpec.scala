package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** MERGE composed with the snapshot log (s32_merge_snapshot) — what the
  * composition must guarantee:
  *
  *  1. Structural sharing: the post-merge manifest references the
  *     untouched partitions' v1 files UNCHANGED (same paths), and those
  *     files' bytes are untouched on disk.
  *  2. Time travel across the upsert: v1 still reads the pre-merge
  *     table exactly, v2 equals the logical whole-relation merge.
  *  3. OCC: a merge derived from snapshot v fails loudly if another
  *     commit landed first — it never publishes stale output on a
  *     later id.
  */
class SnapshotMergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("untouched entries shared; time travel spans the upsert; OCC") {
    val dir = s"${graft.Scratch.dirFor("s32_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    assert(v1 == 1)
    val e1 = SnapshotLog.entries(dir, v1)
    assert(e1.nonEmpty && e1.forall(_.kind == "D"))
    assert(e1.forall(_.partition.startsWith("m=")),
      "every entry must carry its partition label")
    val untouched1 = e1.filterNot(e => Set("m=2", "m=3")(e.partition))
    val sizes1 = untouched1.map(e =>
      e.path -> new java.io.File(e.path).lastModified()).toMap

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
    assert(v2 == 2)

    // 1. untouched v1 entries appear in v2 VERBATIM, files untouched
    val e2 = SnapshotLog.entries(dir, v2)
    val untouched2 = e2.filterNot(e => Set("m=2", "m=3")(e.partition))
    assert(untouched2.map(_.path).sorted == untouched1.map(_.path).sorted,
      "untouched partitions must share v1's files, not be rewritten")
    untouched1.foreach { e =>
      assert(new java.io.File(e.path).lastModified() == sizes1(e.path),
        s"shared file ${e.path} was modified by the merge")
    }
    assert(e2.filter(e => Set("m=2", "m=3")(e.partition))
      .forall(_.path.contains("/data/v2/")),
      "touched partitions must come from the new version root")

    // 2a. v1 still reads the PRE-merge table after v2 committed
    val got1 = SnapshotLog.read(spark, dir, v1)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got1.exceptAll(base).count() == 0 &&
      base.exceptAll(got1).count() == 0,
      "time travel to v1 diverged after the merge commit")
    // 2b. v2 equals the logical whole-relation merge
    val want2 = base
      .filter(!(col("m").isin(2, 3) && col("l_orderkey") % 19 === 0))
      .withColumn("qty",
        when(col("m").isin(2, 3) && col("l_orderkey") % 19 =!= 0 &&
            col("l_orderkey") % 13 === 0,
          (col("l_orderkey") % 47 + 1).cast("int"))
          .otherwise(col("qty")))
      .unionByName(base.filter(col("m").isin(2, 3) &&
          col("l_orderkey") % 19 =!= 0 && col("l_orderkey") % 13 =!= 0 &&
          col("l_orderkey") % 17 === 0)
        .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
          col("l_linenumber"), col("qty"), col("m")))
    val got2 = SnapshotLog.read(spark, dir, v2)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got2.exceptAll(want2).count() == 0 &&
      want2.exceptAll(got2).count() == 0,
      "snapshot merge must equal the logical whole-relation merge")

    // 3. OCC: an interloper rewrites an m=2 file (OVERLAPPING the
    // second merge's touched partitions) AFTER that merge pinned its
    // base to v2 — the pinned merge must FAIL (its derived output is
    // stale and no metadata rebase can fix overlapping partitions),
    // never land on a later id
    assert(SnapshotLog.publishEntries(dir, 3,
      e2.filterNot(_.partition == "m=2"))) // interloper drops m=2 at v3
    intercept[java.util.ConcurrentModificationException] {
      SnapshotMerge(spark, dir, "m",
        Seq("l_orderkey", "l_linenumber"), deletes, updates, inserts,
        Map("qty" -> "new_qty"), fromVersion = Some(v2))
    }
    assert(SnapshotLog.latest(dir) == 3,
      "a failed OCC merge must not advance the table")
  }

  test("OCC rebase: two merges on DISJOINT partitions both commit") {
    val dir = s"${graft.Scratch.dirFor("s32_rebase_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")

    def cdc(months: Seq[Int]) = {
      val src = SnapshotLog.read(spark, dir, v1)
        .filter(col("m").isin(months.map(Integer.valueOf): _*))
      (src.filter(col("l_orderkey") % 19 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("m")),
        src.filter(col("l_orderkey") % 19 =!= 0 &&
            col("l_orderkey") % 13 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("m"),
            (col("l_orderkey") % 47 + 1).cast("int").as("new_qty")))
    }

    // merge A commits from v1 normally
    val (dA, uA) = cdc(Seq(2))
    val v2 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), dA, uA,
      dA.filter(lit(false)).drop("m").withColumn("qty", lit(0))
        .withColumn("m", lit(0)).select("l_orderkey", "l_linenumber",
          "qty", "m"),
      Map("qty" -> "new_qty"))
    assert(v2 == 2)

    // merge B ALSO derived from v1 (a concurrent writer that planned
    // before A committed) but touches only month 7 — DISJOINT from
    // A's month 2, so the logical rebase commits it at v3 with NO
    // caller retry
    val (dB, uB) = cdc(Seq(7))
    val v3 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), dB, uB,
      dB.filter(lit(false)).drop("m").withColumn("qty", lit(0))
        .withColumn("m", lit(0)).select("l_orderkey", "l_linenumber",
          "qty", "m"),
      Map("qty" -> "new_qty"), fromVersion = Some(v1))
    assert(v3 == 3, "disjoint-partition merge must rebase, not fail")

    // v3 carries BOTH merges: A's month-2 files VERBATIM (the rebase
    // adopts the interleaved commit's entries) plus B's fresh month-7
    // files from B's own writer-unique root
    val e3 = SnapshotLog.entries(dir, v3)
    val m2AtV2 = SnapshotLog.entries(dir, v2)
      .filter(_.partition == "m=2").map(_.path).sorted
    assert(e3.filter(_.partition == "m=2").map(_.path).sorted == m2AtV2,
      "rebase must keep the interleaved merge's files")
    val m7Roots = e3.filter(_.partition == "m=7")
      .map(_.path.split("/_gp=").head).distinct
    assert(m7Roots.size == 1 && !m2AtV2.exists(_.startsWith(m7Roots.head)),
      "B's rewrite must live in its own writer root")
    def applied(month: Int) = {
      val got = SnapshotLog.read(spark, dir, v3).filter(col("m") === month)
      assert(got.filter(col("l_orderkey") % 19 === 0).count() == 0,
        s"month $month deletes missing after rebase")
      assert(got.filter(col("l_orderkey") % 13 === 0 &&
        col("qty") =!= (col("l_orderkey") % 47 + 1).cast("int"))
        .count() == 0, s"month $month updates missing after rebase")
    }
    applied(2); applied(7)
    // untouched months still the base rows
    val untouched = SnapshotLog.read(spark, dir, v3)
      .filter(!col("m").isin(2, 7))
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    val wantU = base.filter(!col("m").isin(2, 7))
    assert(untouched.exceptAll(wantU).count() == 0 &&
      wantU.exceptAll(untouched).count() == 0)
  }

  test("MERGE onto a VECTORED table: touched vectors fold, residual survives") {
    val dir = s"${graft.Scratch.dirFor("s32_vec_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    // committed equality deletes across months 2, 3 AND 5 — the merge
    // below touches only 2 and 3, so month 5's keys must survive as a
    // residual vector
    val vecKeys = SnapshotLog.read(spark, dir, v1)
      .filter(col("m").isin(2, 3, 5) && col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v2 = graft.operators.DeleteVectors.appendDeletes(spark, dir, vecKeys)

    val src = SnapshotLog.readMor(spark, dir, v2).filter(col("m").isin(2, 3))
    val emptyDel = src.filter(lit(false))
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val updates = src.filter(col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        (col("l_orderkey") % 47 + 1).cast("int").as("new_qty"))
    val inserts = src.filter(col("l_orderkey") % 13 =!= 0 &&
        col("l_orderkey") % 17 === 0)
      .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
        col("l_linenumber"), col("qty"), col("m"))
    val v3 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), emptyDel, updates, inserts,
      Map("qty" -> "new_qty"))

    val e3 = SnapshotLog.entries(dir, v3)
    // touched partitions' vectors folded INTO the new files
    val rawTouched = spark.read.parquet(
      e3.filter(e => Set("m=2", "m=3")(e.partition)).map(_.path): _*)
    assert(rawTouched.filter(col("l_orderkey") % 19 === 0 &&
      col("l_orderkey") < 1000000L).count() == 0,
      "vector keys not folded into the merged files")
    // residual vector holds ONLY month 5's keys
    val residual = e3.filter(_.kind == "X").map(_.path)
    assert(residual.nonEmpty)
    val residualMonths = spark.read.parquet(residual: _*)
      .select(col("m")).distinct().collect().map(_.getInt(0)).toSet
    assert(residualMonths == Set(5), s"residual months: $residualMonths")

    // the vectored view equals the logical composition: committed
    // deletes first, then the CDC batch on months 2-3
    val afterVec = base.join(vecKeys,
        Seq("l_orderkey", "l_linenumber", "m"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    val want = afterVec
      .withColumn("qty",
        when(col("m").isin(2, 3) && col("l_orderkey") % 13 === 0,
          (col("l_orderkey") % 47 + 1).cast("int"))
          .otherwise(col("qty")))
      .unionByName(afterVec.filter(col("m").isin(2, 3) &&
          col("l_orderkey") % 13 =!= 0 && col("l_orderkey") % 17 === 0)
        .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
          col("l_linenumber"), col("qty"), col("m")))
    val got = SnapshotLog.readMor(spark, dir, v3)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "vectored merge must equal deletes-then-CDC composition")
  }
}
