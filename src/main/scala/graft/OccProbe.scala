package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: per-(band,bucket) occupancy distribution for the
  * MinHash-LSH and RHP banding layers at a given sfDir — the data behind
  * the `spark.graft.lsh.maxBucket` / `spark.graft.rhp.maxBucket`
  * defaults (cap must never fire at oracle geometry, must fire at the
  * degenerate-bucket scale the ScaleProbe's near-dup replication
  * creates).
  */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(defaultCpus = 32)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (d <- args) {
      val prof = graft.llmdata.Dedup.docProfilesLocal(
        Tables.documents(spark, d), "doc_id", "text", n = 5, k = 32)
      val mk = graft.llmdata.Dedup.bandKeys(prof, k = 32, bands = 4)
      val mOcc = mk.groupBy("band", "bucket").count()
        .agg(max("count").as("max"), expr("percentile(count, 0.999)").as("p999"),
          expr("percentile(count, 0.99)").as("p99"), count(lit(1)).as("nBuckets"),
          sum(expr("count * (count - 1) / 2")).as("pairs"))
      println(s"[minhash] $d " + mOcc.collect().head)
      val rk = graft.llmdata.Dedup.rhpBandKeys(Tables.embeddings(spark, d))
      val rOcc = rk.groupBy("band", "bucket").count()
        .agg(max("count").as("max"), expr("percentile(count, 0.999)").as("p999"),
          expr("percentile(count, 0.99)").as("p99"), count(lit(1)).as("nBuckets"),
          sum(expr("count * (count - 1) / 2")).as("pairs"))
      println(s"[rhp]     $d " + rOcc.collect().head)
    }
    spark.stop()
  }
}
