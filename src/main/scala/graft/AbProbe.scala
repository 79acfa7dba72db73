package graft

/** In-JVM A/B timing for one registry query under one conf flip:
  * `tools/run.sh graft.AbProbe <name> <confKey> <valA> <valB> [sfDir] [pairs]`
  * alternates A,B,A,B… in a single session (same JIT, same page cache,
  * same ambient load to first order) and prints per-rep seconds plus
  * the median of each arm — the measurement shape for a host whose
  * background load swings 2x between minutes, where back-to-back
  * same-JVM alternation is the only trustworthy comparison.
  * Caches.clearAll() before every rep so both arms pay full cost.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val key = args(1)
    val valA = args(2)
    val valB = args(3)
    val sfDir = args.lift(4).getOrElse("/root/testdata/sf0.1")
    val pairs = args.lift(5).map(_.toInt).getOrElse(3)
    val spark = Sessions.local()
    // warm-up rep (not counted): JIT + codegen + parquet reader init
    spark.conf.set(key, valA)
    SparkEntry.queries(name)(spark, sfDir).count()
    Caches.clearAll()
    val times = scala.collection.mutable.Map("A" -> List.empty[Double],
      "B" -> List.empty[Double])
    (1 to pairs).foreach { p =>
      Seq("A" -> valA, "B" -> valB).foreach { case (arm, v) =>
        spark.conf.set(key, v)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"pair$p $arm ($key=$v): $t%.3f s rows=$n")
        times(arm) ::= t
        Caches.clearAll()
      }
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"A median ${med(times("A"))}%.3f s   " +
      f"B median ${med(times("B"))}%.3f s")
    spark.stop()
  }
}
