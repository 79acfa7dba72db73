package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Fama–MacBeth (a23_fama_macbeth) — stage 1's sufficient-statistic
  * slope must equal the definitional OLS slope computed brute-force,
  * and stage 2's integer variance numerator must be a true dispersion
  * (non-negative, zero iff all slopes equal).
  */
class FamaMacbethSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-date sufficient-stat slope equals brute-force OLS") {
    val rows = Tables.lineitem(spark, sf)
      .select(to_date(col("l_shipdate")).as("ship_d"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").as("x"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("y"))
      .collect()
      .groupBy(_.getAs[java.sql.Date]("ship_d"))
    // brute force: slope = Σ(x-x̄)(y-ȳ)/Σ(x-x̄)² computed via the
    // integer identity (n·Σxy − ΣxΣy)/(n·Σxx − Σx²), truncating div
    val brute = rows.flatMap { case (d, rs) =>
      val n = rs.size.toLong
      val sx = rs.map(_.getAs[Long]("x")).sum
      val sy = rs.map(_.getAs[Long]("y")).sum
      val sxy = rs.map(r => r.getAs[Long]("x") * r.getAs[Long]("y")).sum
      val sxx = rs.map(r => r.getAs[Long]("x") * r.getAs[Long]("x")).sum
      val den = n * sxx - sx * sx
      if (den == 0L) None else Some(d -> (n * sxy - sx * sy) / den)
    }
    val daily = Tables.lineitem(spark, sf)
      .select(to_date(col("l_shipdate")).as("ship_d"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").as("x"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("y"))
      .groupBy(col("ship_d"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .filter(col("den") =!= 0L)
      .select(col("ship_d"), expr("(n * sxy - sx * sy) div den").as("s"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("ship_d") -> r.getAs[Long]("s"))
      .toMap
    assert(brute.nonEmpty && brute.size == daily.size)
    brute.foreach { case (d, s) =>
      assert(daily(d) == s, s"date $d: query ${daily(d)}, brute $s")
    }
  }

  test("stage-2 variance numerator is a true dispersion") {
    val out = SparkEntry.queries("a23_fama_macbeth")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getAs[Long]("fm_var_num")
      assert(v >= 0L, s"yr ${r.getAs[Int]("yr")}: negative variance numerator $v")
    }
  }
}
