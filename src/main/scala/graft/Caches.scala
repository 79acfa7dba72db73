package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import scala.collection.mutable

/** Registry for persisted intermediates, so cached blocks do not
  * accumulate for the session lifetime (each `persist` without a paired
  * `unpersist` holds executor memory until the app exits).
  *
  * Two lifetimes:
  *  - TRANSIENT: per-query scratch (e.g. the range-partitioned frame in
  *    [[operators.PrefixSum]]). The harness ([[Verify]]/[[Bench]]) calls
  *    [[clearTransient]] after each query's result is materialized.
  *  - SHARED: cross-query memos (e.g. the corrected trade frame feeding
  *    all four `tp_*` queries) — built once, reused, released by
  *    [[clearAll]] at end of run.
  */
object Caches {

  private val transientFrames = mutable.ArrayBuffer.empty[Dataset[_]]
  private val sharedFrames = mutable.Map.empty[String, DataFrame]

  /** Register a per-query persisted frame; unpersisted at [[clearTransient]].
    * Callers must materialize every dependent result BEFORE the harness
    * clears (both Verify and Bench do: write/count, then clear).
    */
  def registerTransient[T <: Dataset[_]](df: T): T = synchronized {
    transientFrames += df; df
  }

  /** Build-once memo of a persisted frame shared across queries. */
  def memo(key: String)(build: => DataFrame): DataFrame = synchronized {
    sharedFrames.getOrElseUpdate(key, build)
  }

  def clearTransient(): Unit = synchronized {
    transientFrames.foreach(_.unpersist(false))
    transientFrames.clear()
  }

  def clearAll(): Unit = synchronized {
    clearTransient()
    sharedFrames.values.foreach(_.unpersist(false))
    sharedFrames.clear()
  }
}
