package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global running aggregates over a total order.
  *
  * `Window.orderBy(...)` with no partition key moves EVERY row to one
  * partition — the classic cumulative-sum scale cliff (fine for a 200-row
  * supplier table, fatal for a 100 TB fact table). This operator computes
  * the same result with the textbook two-phase distributed prefix sum:
  *
  *  1. range-partition by the order key (ascending ranges ↔ ascending
  *     partition ids), compute partition-local running aggregates with a
  *     partition-id-keyed window (parallel);
  *  2. aggregate ONE tiny row per partition (its total), prefix-sum those
  *     on the driver (numPartitions values), broadcast-join the offsets
  *     back and add.
  *
  * Decimal/long inputs stay exact: both phases are plain sums.
  */
object PrefixSum {

  /** Adds `<outCol>` = running sum of `valueCol` and `<rankCol>` = 1-based
    * position, over the global total order given by `order` (must be a
    * total order for determinism).
    *
    * `grandTotals = Some((sumCol, countCol))` additionally attaches the
    * GRAND total sum/count as literal columns — they fall out of the
    * driver-side prefix for free (the accumulators' final values), so
    * callers that need "share of total" metrics (the a9 concentration
    * case) skip a whole extra aggregation pass over the input plus the
    * broadcast cross-join that carried it.
    */
  def withRunningSumAndRank(
      df: DataFrame,
      order: Seq[Column],
      valueCol: Column,
      outCol: String,
      rankCol: String,
      numPartitions: Int = 0,
      persistInput: Boolean = true,
      grandTotals: Option[(String, String)] = None): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // repartitionByRange SAMPLES its child in a separate job before
    // shuffling it, so an unpersisted input runs its whole upstream twice.
    // `persistInput = true` (default) materializes it once — the right call
    // whenever the child does real work, INCLUDING a small aggregate over a
    // big scan (a9's supplier rollup: persisting 1.5k rows beat re-scanning
    // 600k lineitem rows 4x head-to-head). Pass false only when the child
    // is itself a cheap scan. The range-partitioned frame always persists:
    // it feeds both the totals pass and the final plan. At cluster scale
    // these are disk persists. The harness unpersists both after the
    // query's result materializes.
    val input = if (persistInput) graft.Caches.registerTransient(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)) else df
    val ranged = graft.Caches.registerTransient(
      input.repartitionByRange(parts, order: _*)
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged
      .withColumn("__run", sum(valueCol).over(wLocal))
      .withColumn("__rn", count(lit(1)).over(wLocal))
    // one row per partition: its total sum / count (no window needed —
    // aggregate the pre-window frame so this pass skips the sort)
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(valueCol).as("__t"), count(lit(1)).as("__c"))
      .collect()
      .sortBy(_.getInt(0))
    // driver-side prefix over numPartitions rows (tiny by construction)
    var accS = BigDecimal(0); var accC = 0L
    val offsets = totals.map { r =>
      val pid = r.getInt(0)
      val row = (pid, accS, accC)
      accS += (r.get(1) match {
        case d: java.math.BigDecimal => BigDecimal(d)
        case l: java.lang.Long => BigDecimal(l)
        case d: java.lang.Double => BigDecimal(d)
        case null => BigDecimal(0)
      })
      accC += r.getLong(2)
      row
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq
      .map { case (pid, s, c) => (pid, s.toString, c) }
      .toDF("__pid", "__offS", "__offC")
    val runType = local.schema("__run").dataType
    val joined = local.join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, col("__run") + col("__offS").cast(runType))
      .withColumn(rankCol, col("__rn") + col("__offC"))
      .drop("__pid", "__run", "__rn", "__offS", "__offC")
    grandTotals match {
      case Some((sumCol, countCol)) => joined
        .withColumn(sumCol, lit(accS.underlying()).cast(runType))
        .withColumn(countCol, lit(accC))
      case None => joined
    }
  }
}
