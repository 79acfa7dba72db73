package graft

import org.apache.spark.sql.functions._

/** Order-fair core-scaling witness (r16 verdict item "the 8-core
  * scaling run is order-confounded"): one JVM per invocation, master
  * from `$SPARK_GRAFT_CPUS` exactly like Bench, timing a FORCED WIDE
  * AGGREGATE with real per-row compute (xxhash64 chains over a
  * synthetic range — no fixtures, no page cache, no scratch, so arm
  * order cannot flatter either core count). The driver interleaves
  * invocations c32,c8,c32,c8… and compares per-arm minima; a healthy
  * parallel operator should approach the core ratio here, unlike the
  * fixture-commit-bound bench rows at sf0.1.
  *
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.CoreProbe [rows] [reps]
  */
object CoreProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(logLevel = "ERROR")
    val cores = spark.sparkContext.defaultParallelism
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      // 8 chained hashes per row + a 1024-key aggregate: compute-bound,
      // map-side combined, shuffle is 1024 rows — pure CPU scaling
      val row = spark.range(0L, n, 1L, cores * 4)
        .select((col("id") % 1024).as("k"),
          (2 to 8).foldLeft(xxhash64(col("id")))(
            (e, _) => xxhash64(e)).as("h"))
        .groupBy(col("k"))
        // sum a bounded slice of the hash (ANSI mode: a raw long sum
        // overflows), keep the max raw — both witness every row
        .agg(sum(col("h").bitwiseAND(lit(0xFFFFL))).as("s"),
          max(col("h")).as("mx"))
        .agg(sum(col("s")), max(col("mx"))).collect()(0)
      println(f"rep$r cores=$cores n=$n ${(System.nanoTime() - t0) / 1e9}%.3f s (${row.getLong(1)})")
    }
    spark.stop()
  }
}
