package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-time attribution inside one registry query:
  * `tools/run.sh graft.Prof <name> [sfDir] [reps]` runs the query and
  * prints every Spark job it fired (start-relative time, duration,
  * call site) — the fast way to see whether a bench row's seconds go
  * to its fixture build, its stats pass or its actual read, without
  * the Spark UI (disabled in this sandbox). Driver-side gaps between
  * jobs (plan/commit/manifest IO) show up as the delta between one
  * job's end and the next one's start.
  */
object Prof {

  private case class J(id: Int, t0: Long, var t1: Long = -1L,
      site: String = "")

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Sessions.local()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("")
        jobs.put(e.jobId, J(e.jobId, System.nanoTime(), site = site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = System.nanoTime())
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { r =>
      jobs.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat to drain
      Thread.sleep(200)
      println(f"== rep$r: $total%.3f s rows=$n jobs=${jobs.size}")
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.t0)
      var covered = 0.0
      js.foreach { j =>
        val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
        covered += math.max(0.0, dur)
        println(f"  job${j.id}%-4d +${(j.t0 - t0) / 1e9}%7.3f  ${dur}%7.3f s  ${j.site}")
      }
      println(f"  [job-covered ${covered}%.3f s of $total%.3f s — rest is driver-side]")
      // full clear so every rep pays the true cold cost (bench parity)
      Caches.clearAll()
    }
    Caches.clearAll()
    spark.stop()
  }
}
