package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Co-located joins via bucketing — the cluster-scale pattern for the
  * repeated (id)-keyed joins in the pipeline (panel ⋈ flags, panel ⋈
  * enrichment): both sides written `bucketBy` the join key join WITHOUT
  * any shuffle exchange. On 100 TB this turns every id-keyed join in the
  * chain into a zip of co-located buckets.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("id", "lv")
      val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "rv")
      left.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
        .saveAsTable("graft_bkt_left")
      right.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
        .saveAsTable("graft_bkt_right")
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), Seq("id"))
      assert(joined.count() == 1000)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found: $shuffles")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
