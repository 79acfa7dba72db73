package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-spec evolution (s47). Claims pinned:
  *  - the spec change is pure metadata: every v1 entry (path + label)
  *    appears verbatim in v2;
  *  - pruning is per-entry and METADATA-ONLY: after physically deleting
  *    the files the label filter skips, the pruned read still answers,
  *    and equals the pre-delete unpruned read;
  *  - entries from the other spec era are kept conservatively;
  *  - `appendPartitioned` refuses a column that contradicts the active
  *    spec.
  */
class SpecEvolutionSpec extends SparkSpec {

  test("metadata spec change; per-era pruning; loud spec mismatch") {
    import spark.implicits._
    val dir = "/tmp/graft-test/specevo"
    graft.Scratch.clear(dir)
    val old = (0L until 80L).map(i => (i, i % 4, (i % 2).toString))
      .toDF("id", "grp", "flag")
    val v1 = SnapshotMerge.writeInitial(spark, old, dir, "grp")
    val v2 = SnapshotLog.commitSpecChange(dir, "flag")
    assert(SnapshotLog.entries(dir, v2).map(e => (e.path, e.partition)) ==
      SnapshotLog.entries(dir, v1).map(e => (e.path, e.partition)),
      "spec change must carry every entry verbatim")
    assert(SnapshotLog.specOf(dir, v2).contains("flag") &&
      SnapshotLog.specOf(dir, v1).isEmpty)

    // appends must follow the active spec
    intercept[IllegalArgumentException] {
      SnapshotMerge.appendPartitioned(spark,
        Seq((100L, 0L, "0")).toDF("id", "grp", "flag"), dir, "grp")
    }
    val app = (100L until 120L).map(i => (i, i % 4, (i % 2).toString))
      .toDF("id", "grp", "flag")
    val v3 = SnapshotMerge.appendPartitioned(spark, app, dir, "flag")

    // truth before any deletion
    val expect = SnapshotLog.read(spark, dir, v3)
      .filter(col("grp") === 1).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

    // prune on the OLD era's column: grp=0/2/3 files are skippable, the
    // flag-era appends must be kept (conservative) — prove the skip is
    // metadata-only by DELETING the skipped files
    SnapshotLog.entries(dir, v3)
      .filter(e => e.kind == "D" && e.partition.startsWith("grp=") &&
        e.partition != "grp=1")
      .foreach(e => java.nio.file.Files.delete(
        java.nio.file.Paths.get(e.path)))
    val got = SnapshotLog.prunedByPartition(spark, dir, v3, "grp", "1")
      .filter(col("grp") === 1).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect, "pruned read lost rows (or read deleted files)")
    assert(got.exists(_ >= 100L),
      "conservative keep must include the foreign-era appends")
  }

  test("a schema evolution CARRIES the active #spec (and #keys) forward") {
    import spark.implicits._
    val dir = "/tmp/graft-test/specevo-schema/t"
    graft.Scratch.clear("/tmp/graft-test/specevo-schema")
    val base = (0L until 40L).map(i => (i, i % 4, (i * 2).toInt))
      .toDF("id", "grp", "qty")
    SnapshotMerge.writeInitial(spark, base, dir, "grp")
    SnapshotLog.commitSpecChange(dir, "grp")
    SnapshotLog.commitKeysChange(dir, Seq("id"))
    // schema evolution is a header REPLACEMENT for schema/rename only —
    // every other table-level header must survive it
    val canonical = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("quantity",
        org.apache.spark.sql.types.LongType)))
    val v = SnapshotLog.commitSchemaChange(dir, canonical,
      Map("qty" -> "quantity"))
    assert(SnapshotLog.specOf(dir, v).contains("grp"),
      "schema evolution dropped the active partition spec")
    assert(SnapshotLog.keysOf(dir, v).contains(Seq("id")),
      "schema evolution dropped the declared keys")
    assert(SnapshotLog.schemaOf(dir, v).contains(canonical))
    // the spec guard still holds after the evolution
    intercept[IllegalArgumentException] {
      SnapshotMerge.appendPartitioned(spark,
        Seq((100L, 0L, 7L)).toDF("id", "other", "quantity"), dir, "other")
    }
  }
}
