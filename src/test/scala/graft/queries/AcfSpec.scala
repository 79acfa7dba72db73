package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Grouped autocorrelation (w26_acf) — structural properties every
  * Pearson piece must satisfy, plus a closed-form check: a strictly
  * alternating series has lag-1 autocorrelation ≈ −1, lag-2 ≈ +1.
  */
class AcfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("denominators non-negative; r bounded by ±1000 milli") {
    val out = SparkEntry.queries("w26_acf")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("acf_denx") >= 0L)
      assert(r.getAs[Long]("acf_deny") >= 0L)
      if (!r.isNullAt(r.fieldIndex("r_milli"))) {
        val v = r.getAs[Long]("r_milli")
        // floor can land exactly on -1000; +1000 only via r == 1
        assert(v >= -1000L && v <= 1000L, s"r_milli out of range: $v")
      }
    }
  }

  test("alternating series: lag-1 r ~ -1000, lag-2 r ~ +1000") {
    import spark.implicits._
    val series = (1 to 40).map(i =>
      (1L,
        java.sql.Date.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)),
        if (i % 2 == 0) 10L else -10L))
      .toDF("g", "d", "x")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("d"))
    val pairs = series
      .withColumn("x1", lag(col("x"), 1).over(w))
      .withColumn("x2", lag(col("x"), 2).over(w))
      .select(col("g"), col("x"),
        expr("stack(2, 1, x1, 2, x2) AS (lag_h, xh)"))
      .filter(col("xh").isNotNull)
    val agg = pairs.groupBy(col("g"), col("lag_h"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("xh")).as("sxh"), sum(col("x") * col("x")).as("sxx"),
        sum(col("xh") * col("xh")).as("sxhxh"),
        sum(col("x") * col("xh")).as("sxy"))
      .select(col("lag_h"),
        ((col("n") * col("sxy") - col("sx") * col("sxh")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            * (col("n") * col("sxhxh") - col("sxh") * col("sxh"))
              .cast("double"))).as("r"))
      .collect().map(r => r.getAs[Int]("lag_h") -> r.getAs[Double]("r"))
      .toMap
    assert(math.abs(agg(1) + 1.0) < 0.01, s"lag-1 r: ${agg(1)}")
    assert(math.abs(agg(2) - 1.0) < 0.01, s"lag-2 r: ${agg(2)}")
  }
}
