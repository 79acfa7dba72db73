package graft.app

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the row-level complement to dynamic
  * partition pruning: a selective filter on the small side of a
  * shuffle join gets distilled into a bloom filter that pre-filters the
  * big side's SCAN, so most fact rows die before the exchange. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~1% that can match. The spec pins the exact conf
  * surface a cluster deployment needs (SCALING.md).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact scan") {
    val sf = "/root/testdata/sf0.001"
    val confs = Seq(
      // local test tables are far below the default 10 GB application-side
      // threshold — drop it so the injection rule considers them
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // a broadcast join would skip injection (the broadcast itself prunes);
      // force the shuffle-join regime the rule exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter might_contain predicate on the fact side:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
