package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build and incremental
  * merge — the upsert primitive behind an incremental warehouse refresh
  * (the reference's S10 incremental sink keeps only latest rows; SCD2
  * keeps the full validity history a point-in-time join needs).
  *
  * `build` collapses an event log into intervals: one row per
  * consecutive run of equal `attr` per `key`, valid_from = the run's
  * first event, valid_to = the next run's start (NULL = current).
  *
  * `merge` folds a change batch into an existing history WITHOUT
  * rebuilding untouched keys: keys absent from the batch pass through
  * with no window (at 100 TB that is almost the whole dimension — the
  * incremental win), touched keys replay their stored change points
  * plus the new events through `build`. Because run collapse is
  * prefix-stable (runs in a prefix depend only on the prefix), the
  * merged history is EXACTLY the history a full rebuild over
  * old ∪ new events produces — the invariant the s16 oracle checks.
  *
  * Scale shape: `build` is one shuffle on `key` (both windows share the
  * partitioning, Catalyst reuses the exchange); `merge` adds one
  * semi/anti join pair against the batch's distinct keys.
  */
object Scd2 {

  /** `tie` breaks equal-`ord` events totally; it is kept in the output
    * so [[merge]] can replay intervals as events deterministically.
    */
  def build(events: DataFrame, key: String, attr: String,
      ord: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ord), col(tie))
    events
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .drop("__prev")
      .withColumn("valid_to", lead(col(ord), 1).over(w))
      .withColumnRenamed(ord, "valid_from")
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
  }

  def merge(base: DataFrame, changes: DataFrame, key: String, attr: String,
      ord: String, tie: String): DataFrame = {
    val keys = changes.select(col(key)).distinct()
    val untouched = base.join(keys, Seq(key), "left_anti")
    val replayOld = base.join(keys, Seq(key), "left_semi")
      .select(col(key), col(attr), col("valid_from").as(ord), col(tie))
    val rebuilt = build(
      replayOld.unionByName(
        changes.select(col(key), col(attr), col(ord), col(tie))),
      key, attr, ord, tie)
    untouched.unionByName(rebuilt)
  }
}
