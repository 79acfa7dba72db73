package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The GENERIC change-feed diff for a snapshot transition — the
  * key-level D/U/I classification the batch `changeFeed` computes for
  * the fixture tables, generalized to any table that DECLARED its
  * logical keys ([[SnapshotLog.commitKeysChange]], the `#keys` header).
  *
  * Shape: both sides read ONLY their changed entries (the
  * [[SnapshotLog.changedEntries]] manifest diff — unchanged files
  * cannot contribute), each under its own delete vectors; rows reduce
  * to full-row value groups with SIGNED counts (union + one group-by —
  * no join, and null values group correctly where a join's `=` would
  * drop them); groups whose counts cancel are unchanged; the survivors
  * fold to one row per changed KEY:
  *
  *   old rows only → D, new rows only → I, both → U.
  *
  * This is exactly the U-split a copy-on-write MERGE transition needs —
  * rewritten-but-identical rows cancel in the group-by, so a consumer
  * sees the true logical delta, not the rewrite. Cost: a scan of the
  * rewritten partitions (bounded by the commit), output bounded by the
  * churn. Pure batch — the streaming source runs it once per replayed
  * COW commit at plan time.
  */
object ChangeDiff {

  /** one row per changed key: (keys..., op) for vOld → vNew. */
  def diffKeys(s: SparkSession, tableDir: String, vOld: Int, vNew: Int,
      keys: Seq[String]): DataFrame = {
    val (oldCh, newCh) = SnapshotLog.changedEntries(tableDir, vOld, vNew)
    def side(v: Int, changed: Seq[SnapshotLog.FileEntry],
        w: Int): DataFrame = {
      val dels = SnapshotLog.entries(tableDir, v).filter(_.kind != "D")
      val base =
        if (changed.isEmpty)
          SnapshotLog.read(s, tableDir, vNew).filter(lit(false))
        else SnapshotLog.morFrame(s, tableDir, v, changed ++ dels)
      base.withColumn("_w", lit(w))
    }
    val o = side(vOld, oldCh, -1)
    val n = side(vNew, newCh, 1)
    val dataCols = o.columns.filterNot(_ == "_w").toSeq
    keys.foreach(k => require(dataCols.contains(k),
      s"declared key '$k' is not a column of $tableDir"))
    // signed full-row value groups: identical rewritten rows cancel
    val groups = o.unionByName(n)
      .groupBy(dataCols.map(col): _*)
      .agg(sum(when(col("_w") < 0, lit(1L)).otherwise(0L)).as("_n_old"),
        sum(when(col("_w") > 0, lit(1L)).otherwise(0L)).as("_n_new"))
      .filter(col("_n_old") =!= col("_n_new"))
    groups.groupBy(keys.map(col): _*)
      .agg(sum(col("_n_old")).as("_o"), sum(col("_n_new")).as("_n"))
      .withColumn("_op",
        when(col("_n") === 0, "D")
          .when(col("_o") === 0, "I")
          .otherwise("U"))
      .select((keys.map(col) :+ col("_op")): _*)
  }
}
