package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries after a JVM/codegen warmup pass —
  * `SPARK_GRAFT_CPUS=32 tools/run.sh graft.Time <sfDir> name [name ...]`.
  * Repeats each query `SPARK_GRAFT_REPS` times (default 1).
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = Sessions.local(defaultCpus = 32, logLevel = "ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n%-28s run$r ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        Caches.clearTransient()
      }
    }
    Caches.clearAll()
    spark.stop()
  }
}
