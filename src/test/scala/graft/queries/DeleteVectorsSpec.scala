package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{DeleteVectors, SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** Merge-on-read delete vectors (s34_delete_vectors) — what makes them
  * the cheap-delete tier:
  *
  *  1. A delete commit rewrites NO data file (v1's data entries appear
  *     in v2 verbatim, bytes untouched) yet the deletes are visible
  *     through `readMor`.
  *  2. Compaction folds the vectors away: v3 has no "X" entries, reads
  *     WITHOUT the anti-join, and equals the vectored view exactly.
  *  3. Time travel: v1 still reads the full pre-delete table.
  */
class DeleteVectorsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("deletes visible with zero data rewrite; compaction folds vectors") {
    val dir = s"${graft.Scratch.dirFor("s34_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val e1 = SnapshotLog.entries(dir, v1)
    val mtimes1 = e1.map(e =>
      e.path -> new java.io.File(e.path).lastModified()).toMap

    val delKeys = SnapshotLog.read(spark, dir, v1)
      .filter(col("m").isin(2, 3) && col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v2 = DeleteVectors.appendDeletes(spark, dir, delKeys)

    // 1. data entries shared verbatim, files untouched on disk
    val e2 = SnapshotLog.entries(dir, v2)
    assert(e2.filter(_.kind == "D").map(_.path).sorted ==
      e1.map(_.path).sorted, "a delete commit must not rewrite data files")
    assert(e2.exists(_.kind == "X"), "v2 must carry a delete entry")
    e1.foreach { e =>
      assert(new java.io.File(e.path).lastModified() == mtimes1(e.path),
        s"data file ${e.path} was touched by a delete commit")
    }
    val want = base.join(delKeys, Seq("l_orderkey", "l_linenumber", "m"),
        "left_anti") // using-columns join reorders — re-select for exceptAll
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    val got2 = SnapshotLog.readMor(spark, dir, v2)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got2.exceptAll(want).count() == 0 &&
      want.exceptAll(got2).count() == 0,
      "merge-on-read view must equal the logical anti-join")

    // 2. compaction: vector-free snapshot, same content
    val v3 = DeleteVectors.compact(spark, dir, "m")
    val e3 = SnapshotLog.entries(dir, v3)
    assert(e3.forall(_.kind == "D"), "compaction must fold the vectors away")
    val got3 = SnapshotLog.read(spark, dir, v3)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got3.exceptAll(got2).count() == 0 &&
      got2.exceptAll(got3).count() == 0,
      "compacted snapshot diverged from the vectored view")

    // 3. v1 unaffected throughout
    val got1 = SnapshotLog.read(spark, dir, v1)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got1.exceptAll(base).count() == 0 &&
      base.exceptAll(got1).count() == 0)
  }

  test("partition-scoped compaction: fold only the hot slice, residual vector") {
    val dir = s"${graft.Scratch.dirFor("s36_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val delKeys = SnapshotLog.read(spark, dir, v1)
      .filter(col("m").isin(2, 3) && col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v2 = DeleteVectors.appendDeletes(spark, dir, delKeys)
    val wantView = SnapshotLog.readMor(spark, dir, v2)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head

    val v3 = DeleteVectors.compactPartitions(spark, dir, "m", Seq(2))
    val e2 = SnapshotLog.entries(dir, v2)
    val e3 = SnapshotLog.entries(dir, v3)
    // only m=2's data files were rewritten; everything else shared
    assert(e3.filter(e => e.kind == "D" && e.partition != "m=2")
      .map(_.path).sorted ==
      e2.filter(e => e.kind == "D" && e.partition != "m=2")
        .map(_.path).sorted,
      "partition-scoped compaction rewrote an unscoped partition")
    assert(e3.filter(_.partition == "m=2").forall(_.path.contains("/data/v3/")))
    // the residual vector carries ONLY month-3 keys
    val residual = e3.filter(_.kind == "X").map(_.path)
    assert(residual.nonEmpty, "month-3 deletes must survive as a residual")
    val residualMonths = spark.read.parquet(residual: _*)
      .select(col("m")).distinct().collect().map(_.getInt(0)).toSet
    assert(residualMonths == Set(3), s"residual months: $residualMonths")
    // the vectored view is unchanged by the fold
    assert(SnapshotLog.readMor(spark, dir, v3)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head == wantView)
    // compacted rows are REALLY gone from the m=2 files (not just hidden
    // by the residual): the raw data read holds no deleted m=2 key
    val rawM2 = SnapshotLog.read(spark, dir, v3)
      .filter(col("m") === 2 && col("l_orderkey") % 19 === 0)
    assert(rawM2.count() == 0, "m=2 deletes not materialized by the fold")

    // compacting the remaining partition folds the vector away entirely
    val v4 = DeleteVectors.compactPartitions(spark, dir, "m", Seq(3))
    assert(SnapshotLog.entries(dir, v4).forall(_.kind == "D"))
    assert(SnapshotLog.read(spark, dir, v4)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head == wantView)

    // delete keys without the partition column are rejected
    val v5 = DeleteVectors.appendDeletes(spark, dir,
      SnapshotLog.read(spark, dir, v4).limit(5)
        .select(col("l_orderkey"), col("l_linenumber")))
    assert(v5 == 5)
    intercept[IllegalArgumentException] {
      DeleteVectors.compactPartitions(spark, dir, "m", Seq(2))
    }
    // ... and so is a partition list matching no data entries (typo'd
    // value / already-compacted slice): loud, up front, not a
    // mid-write schema-inference crash
    intercept[IllegalArgumentException] {
      DeleteVectors.compactPartitions(spark, dir, "m", Seq(99))
    }
  }

  test("vectors are SEQUENCE-scoped: a re-inserted key is served") {
    val dir = s"${graft.Scratch.dirFor("seq_scope_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val keys = SnapshotLog.read(spark, dir, v1)
      .filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v2 = DeleteVectors.appendDeletes(spark, dir, keys)
    assert(SnapshotLog.readMor(spark, dir, v2)
      .filter(col("l_orderkey") % 19 === 0).count() == 0)

    // a LATER commit re-inserts the deleted keys (a stream batch) —
    // the v2 vector must NOT suppress them: it applies only to data
    // committed strictly before it (the Iceberg sequence-number rule;
    // pre-seq semantics silently lost these rows)
    val reinserted = base.filter(col("l_orderkey") % 19 === 0)
      .withColumn("qty", lit(7))
    val v3 = graft.streaming.SnapshotCommitSink
      .commitBatch(spark, dir, reinserted, 0L)
    val got = SnapshotLog.readMor(spark, dir, v3)
      .filter(col("l_orderkey") % 19 === 0)
    assert(got.count() == reinserted.count(),
      "the older vector suppressed rows appended after it")
    assert(got.filter(col("qty") =!= 7).count() == 0,
      "served rows must be the re-inserted ones, not resurrected olds")
    // and the pre-reinsert snapshot still reads vectored
    assert(SnapshotLog.readMor(spark, dir, v2)
      .filter(col("l_orderkey") % 19 === 0).count() == 0)
  }
}
