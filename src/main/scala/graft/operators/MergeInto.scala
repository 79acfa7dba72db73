package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned MERGE INTO — the lake upsert (Delta/Iceberg MERGE)
  * as an explicit operator: a CDC batch carrying op ∈ {D, U, I} rows is
  * applied to a partitioned parquet table by rewriting ONLY the
  * partitions the batch touches. The three-way apply inside a touched
  * partition is anti-join (deletes) → left join + coalesce (updates) →
  * union (inserts); untouched partitions are never read and never
  * written — their files stay byte-identical (`MergeIntoSpec` pins
  * that), which is what makes MERGE affordable on a 100 TB table where
  * a day's CDC touches a handful of date partitions.
  *
  * Mechanics worth naming: the touched-partition list is collected from
  * the CDC batch (metadata-scale, the planner step every table format
  * runs); the pruned read carries the partition filter into the scan;
  * the rewrite commits through dynamic partition overwrite (only
  * partitions PRESENT in the output are replaced); and the merged frame
  * is lineage-truncated (localCheckpoint) before the write because
  * Spark refuses to overwrite a path it is still reading from.
  */
object MergeInto {

  /** Apply `cdc` (op: D/U/I; key columns; `new_*` value columns for U;
    * full rows for I) to the table at `tableDir` partitioned by
    * `partCol`. Returns the touched partition values.
    *
    * CDC contract: D rows carry the key; U rows carry the key +
    * `newValues` (name → column to coalesce over the base value); I
    * rows carry the full schema of the table.
    */
  def apply(s: SparkSession, tableDir: String, partCol: String,
      keyCols: Seq[String], deletes: DataFrame, updates: DataFrame,
      inserts: DataFrame, newValues: Map[String, String]): Seq[Any] = {
    val touched = deletes.select(col(partCol))
      .unionByName(updates.select(col(partCol)))
      .unionByName(inserts.select(col(partCol)))
      .distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return Nil
    val cur = s.read.parquet(tableDir)
      .filter(col(partCol).isin(touched: _*))
    val cols = cur.columns.toSeq
    val afterDel = cur.join(
      deletes.select(keyCols.map(col): _*), keyCols, "left_anti")
    // MERGE precondition (same as SQL MERGE): at most one source row
    // per target key — CDC rows repeated across partitions with
    // identical values collapse here; true conflicts are caller bugs
    val afterUpd = afterDel.join(
        updates.select((keyCols.map(col) ++
          newValues.values.map(col).toSeq): _*).distinct(),
        keyCols, "left")
      .select(cols.map { c =>
        newValues.collectFirst { case (tgt, src) if tgt == c =>
          coalesce(col(src), col(c)).as(c)
        }.getOrElse(col(c))
      }: _*)
    val merged = afterUpd.unionByName(inserts.select(cols.map(col): _*))
      // truncate lineage: the write target is also the read source
      .localCheckpoint(true)
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.partitionBy(partCol).mode("overwrite").parquet(tableDir)
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    touched
  }
}
