package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins the round-8 structural invariant: [[Sessions]] is the ONLY place
  * in `src/main` that constructs a SparkSession, and it can never yield a
  * session without `spark.sql.session.timeZone=UTC` (the events-ts
  * normalization is session-zone-sensitive — an unpinned entry point
  * would silently run a different workload than the oracle gate checks).
  */
class SessionFactorySpec extends SparkSpec {

  private val tzKey = "spark.sql.session.timeZone"

  test("no entry point builds a SparkSession outside Sessions.local") {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"run from repo root (cwd=${Paths.get("").toAbsolutePath})")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter(p => p.getFileName.toString != "Sessions.scala")
      .filter(p => Files.readString(p).contains("SparkSession.builder"))
      .map(_.toString).toList
    assert(offenders.isEmpty,
      s"SparkSession.builder outside the Sessions factory: $offenders — " +
        "route through Sessions.local so UTC/extensions/shuffle sizing " +
        "stay structurally pinned")
  }

  test("Sessions.local yields a UTC session with graft extensions live") {
    val s = Sessions.local()
    assert(s.conf.get(tzKey) == "UTC")
    // extensions actually installed, not just configured: the registered
    // native function must resolve by name
    assert(s.sql("SELECT log2milli(CAST(8 AS BIGINT))")
      .collect().head.getLong(0) == 3000L)
  }

  test("Sessions.local never yields a non-UTC session") {
    // simulate the hazard: an already-running session whose zone drifted.
    // Acceptable factory outcomes are (a) refuse (require fires) or
    // (b) repin to UTC — what may never happen is handing back non-UTC.
    spark.conf.set(tzKey, "America/New_York")
    try {
      val out =
        try Right(Sessions.local())
        catch { case e: IllegalArgumentException => Left(e) }
      out match {
        case Right(s2) => assert(s2.conf.get(tzKey) == "UTC",
          "factory returned a non-UTC session")
        case Left(_) => () // refused — also correct
      }
    } finally spark.conf.set(tzKey, "UTC")
  }
}
