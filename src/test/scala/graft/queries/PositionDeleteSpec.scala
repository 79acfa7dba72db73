package graft.queries

import graft.SparkSpec
import graft.operators.{DeleteVectors, SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** Position deletes (s41_position_deletes) — what equality vectors
  * cannot do, pinned on a minimal table:
  *
  *  1. Deleting ONE of two byte-identical rows: one survives, with
  *     zero data files rewritten (v1 entries verbatim in v2).
  *  2. An equality delete of the same key would remove BOTH copies —
  *     the two tiers genuinely differ.
  *  3. Compaction folds the position file away; content unchanged;
  *     residual-free manifest.
  *  4. `positionsOf` addresses match what `readMor` subtracts.
  */
class PositionDeleteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("delete one of two identical physical rows; compaction folds") {
    val dir = s"${graft.Scratch.dirFor("s41_spec", sf)}/t"
    graft.Scratch.clear(dir)
    import spark.implicits._
    // two IDENTICAL rows (k=1) plus singletons, one partition each
    val base = Seq((1L, 10, 1), (1L, 10, 1), (2L, 20, 1), (3L, 30, 2))
      .toDF("k", "qty", "m")
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val e1 = SnapshotLog.entries(dir, v1)

    // address every physical copy of k=1; delete all but the first
    val addr = DeleteVectors.positionsOf(spark, dir, v1, col("k") === 1)
      .orderBy(col("file_path"), col("row_pos"))
      .collect()
    assert(addr.length == 2, "both physical copies must be addressable")
    val v2 = DeleteVectors.appendPositionDeletes(spark, dir,
      Seq((addr(1).getString(0), addr(1).getLong(1)))
        .toDF("file_path", "row_pos"))

    // 1. zero rewrite; exactly one k=1 row survives
    val e2 = SnapshotLog.entries(dir, v2)
    assert(e2.filter(_.kind == "D").map(_.path).sorted ==
      e1.map(_.path).sorted, "a position delete must rewrite nothing")
    assert(e2.count(_.kind == "P") == 1)
    val got2 = SnapshotLog.readMor(spark, dir, v2)
    assert(got2.filter(col("k") === 1).count() == 1,
      "exactly one duplicate must survive a position delete")
    assert(got2.count() == 3)

    // 2. the equality tier CANNOT express this: deleting key 1 via a
    // vector on a fresh branch removes BOTH copies
    val dir2 = s"${graft.Scratch.dirFor("s41_spec_eq", sf)}/t"
    graft.Scratch.clear(dir2)
    SnapshotMerge.writeInitial(spark, base, dir2, "m")
    val vEq = DeleteVectors.appendDeletes(spark, dir2,
      Seq((1L, 1)).toDF("k", "m"))
    assert(SnapshotLog.readMor(spark, dir2, vEq)
      .filter(col("k") === 1).count() == 0,
      "an equality vector removes every copy — the tiers must differ")

    // 3. compaction folds the position file; content unchanged
    val v3 = DeleteVectors.compact(spark, dir, "m")
    val e3 = SnapshotLog.entries(dir, v3)
    assert(e3.forall(_.kind == "D"))
    val got3 = SnapshotLog.readMor(spark, dir, v3)
      .select(col("k"), col("qty"), col("m"))
    val want = got2.select(col("k"), col("qty"), col("m"))
    assert(got3.exceptAll(want).count() == 0 &&
      want.exceptAll(got3).count() == 0)

    // 4. time travel: v1 still shows both copies
    assert(SnapshotLog.read(spark, dir, v1)
      .filter(col("k") === 1).count() == 2)
  }
}
