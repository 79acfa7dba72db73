package graft

/** Dev tool: dump one query's formatted physical plan with optional
  * session confs and an optional warm-up execution first (so memoized
  * fixtures show as InMemoryTableScan exactly as a steady-state plan
  * would):
  *   tools/run.sh graft.PlanDump <name> <sfDir> [warm] [k=v ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warm = args.lift(2).contains("warm")
    val spark = Sessions.local(logLevel = "ERROR")
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    if (warm) SparkEntry.queries(name)(spark, sfDir).count()
    println(Plans.formatted(SparkEntry.queries(name)(spark, sfDir)))
    spark.stop()
  }
}
