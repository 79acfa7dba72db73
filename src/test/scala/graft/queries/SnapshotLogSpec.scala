package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** Snapshot log (s31_time_travel) — what makes it a table format:
  *
  *  1. Time travel: after a copy-on-write commit, the OLD snapshot
  *     still reads the original table exactly.
  *  2. Manifests are immutable: committing v2 does not touch v1's
  *     manifest bytes.
  *  3. Atomic publish: a crashed commit (tmp present, never moved) is
  *     invisible — latest() and readers resolve only complete
  *     manifests.
  */
class SnapshotLogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("time travel, manifest immutability, crashed commits invisible") {
    val dir = s"${graft.Scratch.dirFor("s31_tt_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    base.filter(col("m") =!= 3).write.mode("overwrite")
      .parquet(s"$dir/data/rest")
    base.filter(col("m") === 3).write.mode("overwrite")
      .parquet(s"$dir/data/m3")
    val rest = SnapshotLog.dataFiles(s"$dir/data/rest")
    val v1 = SnapshotLog.commit(dir,
      rest ++ SnapshotLog.dataFiles(s"$dir/data/m3"))
    assert(v1 == 1 && SnapshotLog.latest(dir) == 1)
    val m1 = java.nio.file.Paths.get(dir, "_manifests", "v1.manifest")
    val v1Bytes = java.nio.file.Files.readAllBytes(m1).toSeq

    spark.read.parquet(SnapshotLog.dataFiles(s"$dir/data/m3"): _*)
      .withColumn("qty", col("qty") + 7)
      .write.mode("overwrite").parquet(s"$dir/data/m3_r1")
    val v2 = SnapshotLog.commit(dir,
      rest ++ SnapshotLog.dataFiles(s"$dir/data/m3_r1"))
    assert(v2 == 2 && SnapshotLog.latest(dir) == 2)

    // 1. v1 still reads the ORIGINAL table after v2 committed
    val got = SnapshotLog.read(spark, dir, v1)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got.exceptAll(base).count() == 0 &&
      base.exceptAll(got).count() == 0,
      "time travel to v1 diverged from the original table")
    // and v2 sees the rewrite
    val bumped = SnapshotLog.read(spark, dir, v2)
      .filter(col("m") === 3).agg(min(col("qty"))).head.getInt(0)
    val orig = base.filter(col("m") === 3).agg(min(col("qty"))).head.getInt(0)
    assert(bumped == orig + 7)

    // 2. v1's manifest bytes unchanged by the v2 commit
    assert(java.nio.file.Files.readAllBytes(m1).toSeq == v1Bytes)

    // 3. a crashed commit (tmp never moved) is invisible
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", ".v3.manifest.tmp"),
      "bogus".getBytes("UTF-8"))
    assert(SnapshotLog.latest(dir) == 2)
    intercept[IllegalArgumentException] {
      SnapshotLog.files(dir, 3)
    }
  }
}
