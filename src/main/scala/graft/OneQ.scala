package graft

/** one-query timing harness: `tools/run.sh graft.OneQ <name> [sfDir] [reps]`
  * runs a single registry query repeatedly and prints per-rep wall time —
  * the fast way to separate steady-state cost from JIT/page-cache warm-up
  * when a bench row moves (used to clear the r14 sk_cms_joinsize drift). */
object OneQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"rep$r: ${(System.nanoTime()-t0)/1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
