package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** Snapshot expiry / VACUUM (s35_snapshot_expire) — what the lifecycle
  * operator must guarantee:
  *
  *  1. Exactly the right files die: files referenced ONLY by expired
  *     manifests are deleted; files shared with any retained manifest
  *     survive byte-identical.
  *  2. The retained snapshot reads exactly its committed state after
  *     the vacuum.
  *  3. Time travel below keepFrom fails loudly (manifest gone), and
  *     keepFrom = 1 is a no-op.
  */
class SnapshotExpireSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("expire deletes only v1-exclusive files; retained snapshot intact") {
    val dir = s"${graft.Scratch.dirFor("s35_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")

    // keepFrom = 1 retains everything — vacuum is a no-op
    assert(SnapshotLog.expire(dir, keepFrom = 1).isEmpty)
    assert(SnapshotLog.latest(dir) == 1)

    val src = SnapshotLog.read(spark, dir, v1).filter(col("m").isin(2, 3))
    val deletes = src.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val emptyUpd = src.filter(lit(false))
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        col("qty").as("new_qty"))
    val emptyIns = src.filter(lit(false))
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    val v2 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes, emptyUpd, emptyIns,
      Map("qty" -> "new_qty"))

    val e1 = SnapshotLog.entries(dir, v1).map(_.path).toSet
    val e2 = SnapshotLog.entries(dir, v2).map(_.path).toSet
    val exclusive = e1 -- e2 // v1's old month-2/3 files
    val shared = e1.intersect(e2)
    assert(exclusive.nonEmpty && shared.nonEmpty)
    val want = SnapshotLog.read(spark, dir, v2)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head

    val dead = SnapshotLog.expire(dir, keepFrom = v2).toSet
    // 1. exactly the v1-exclusive files died
    assert(dead == exclusive, s"vacuum deleted ${dead -- exclusive} " +
      s"extra / missed ${exclusive -- dead}")
    exclusive.foreach(p => assert(!new java.io.File(p).exists(), p))
    shared.foreach(p => assert(new java.io.File(p).exists(), p))
    // 2. retained snapshot reads its exact committed state post-vacuum
    assert(SnapshotLog.read(spark, dir, v2)
      .agg(count(lit(1)), sum(col("qty")).cast("long")).head == want)
    assert(SnapshotLog.latest(dir) == v2)
    // 3. time travel below keepFrom fails loudly
    intercept[IllegalArgumentException] { SnapshotLog.files(dir, v1) }
    // out-of-range keepFrom is rejected
    intercept[IllegalArgumentException] {
      SnapshotLog.expire(dir, keepFrom = 99)
    }
  }
}
