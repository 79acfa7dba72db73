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
    val merged =
      threeWayApply(cur, keyCols, deletes, updates, inserts, newValues)
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
    // Dynamic overwrite only replaces partitions PRESENT in the output.
    // A CDC batch that deletes EVERY row of a touched partition leaves
    // that partition with zero output rows — its old files would
    // silently survive and the deletes resurface. Clear touched
    // partitions absent from the merged frame explicitly (the distinct
    // is over the checkpointed merged frame and is bounded by the
    // touched-partition count — metadata-scale).
    val present = merged.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    touched.filterNot(present).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(tableDir, s"$partCol=$v")
      if (fs.exists(p)) fs.delete(p, true)
    }
    touched
  }

  /** The logical MERGE over the (already pruned) current rows: anti-join
    * deletes → left-join + coalesce updates → union inserts. Shared by
    * the in-place dynamic-overwrite path above and the snapshot-log
    * copy-on-write path ([[SnapshotMerge]]) so the two commit protocols
    * cannot drift on semantics.
    *
    * MERGE precondition (same as SQL MERGE): at most one source row per
    * target key. CDC rows repeated across partitions with identical
    * values collapse under distinct(); a key left with >1 DISTINCT
    * value rows would silently row-multiply the target through the
    * left join, so it is ENFORCED — Delta's "multiple source rows
    * matched" error, raised task-side (raise_error inside a filter over
    * a window count; no extra driver pass).
    */
  private[operators] def threeWayApply(cur: DataFrame, keyCols: Seq[String],
      deletes: DataFrame, updates: DataFrame, inserts: DataFrame,
      newValues: Map[String, String]): DataFrame = {
    val cols = cur.columns.toSeq
    val afterDel = cur.join(
      deletes.select(keyCols.map(col): _*), keyCols, "left_anti")
    val updDedup = updates.select((keyCols.map(col) ++
      newValues.values.map(col).toSeq): _*).distinct()
    val nSrc = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*))
    val updChecked = updDedup
      .withColumn("_graft_nsrc", nSrc)
      .filter(when(col("_graft_nsrc") > 1,
          raise_error(concat(
            lit("MERGE: multiple source rows matched target key ("),
            concat_ws(", ", keyCols.map(c => col(c).cast("string")): _*),
            lit(")"))).cast("boolean"))
        .otherwise(lit(true)))
      .drop("_graft_nsrc")
    val afterUpd = afterDel.join(updChecked, keyCols, "left")
      .select(cols.map { c =>
        newValues.collectFirst { case (tgt, src) if tgt == c =>
          coalesce(col(src), col(c)).as(c)
        }.getOrElse(col(c))
      }: _*)
    afterUpd.unionByName(inserts.select(cols.map(col): _*))
  }
}
