package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sum must equal the single-partition
  * window result exactly (decimal inputs, arbitrary partition count).
  */
class PrefixSumSpec extends SparkSpec {

  test("running sum and rank equal the global-window reference") {
    import spark.implicits._
    val df = (1 to 997).map(i => (i.toLong, ((i * 37) % 500).toLong))
      .toDF("k", "raw")
      .withColumn("v", col("raw").cast("decimal(18,2)"))
    val twoPhase = PrefixSum.withRunningSumAndRank(
        df, order = Seq(col("v").desc, col("k").asc),
        valueCol = col("v"), outCol = "cum", rankCol = "rk",
        numPartitions = 7)
      .select(col("k"), col("cum").cast("double"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val w = Window.orderBy(col("v").desc, col("k").asc)
    val reference = df
      .withColumn("cum",
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("k"), col("cum").cast("double"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(twoPhase.toSeq == reference.toSeq)
  }

  test("grandTotals columns equal a full aggregate over the input") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, ((i * 13) % 90).toLong))
      .toDF("k", "raw")
      .withColumn("v", col("raw").cast("decimal(18,2)"))
    val out = PrefixSum.withRunningSumAndRank(
        df, order = Seq(col("v").desc, col("k").asc),
        valueCol = col("v"), outCol = "cum", rankCol = "rk",
        numPartitions = 5, persistInput = false,
        grandTotals = Some(("tot", "n")))
      .select(col("tot").cast("double"), col("n")).distinct().collect()
    assert(out.length == 1)
    val expTot = df.agg(sum(col("v")).cast("double")).head.getDouble(0)
    assert(out.head.getDouble(0) == expTot && out.head.getLong(1) == 200L)
  }

  test("a15 global quantiles match a driver-side sort, no 1-partition exchange") {
    graft.GraftExtensions.ensure(spark)
    val sf = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("a15_exact_quantiles")(spark, sf)
    // the whole point of the PrefixSum formulation: the physical plan must
    // not funnel the fact table through Exchange SinglePartition
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global quantiles must not single-partition the input:\n$plan")
    val got = q.collect()
      .map(r => r.getAs[String]("q_label") -> r.getAs[Double]("value")).toMap
    val vals = graft.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length.toLong
    def pick(num: Long, den: Long) = vals(((num * n + den - 1) / den - 1).toInt)
    assert(got("p25") == pick(1, 4) && got("p50") == pick(1, 2) &&
      got("p75") == pick(3, 4) && got("p90") == pick(9, 10) &&
      got("p99") == pick(99, 100))
  }
}
