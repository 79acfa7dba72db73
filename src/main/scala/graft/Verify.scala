package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // local-iteration filter mirroring Bench's: unset = all queries
    val queries = SparkEntry.filteredQueries("SPARK_GRAFT_VERIFY_ONLY")
    // write the oracle file BEFORE running any query: if one query hangs
    // or the JVM dies mid-run, the completed results remain comparable
    // instead of the whole round silently losing its oracle map. The
    // map is restricted to the filtered set — a full map over a
    // filtered dump would make every unrun query read as a failure to
    // an oracle-map-driven comparer
    val json = SparkEntry.oracleSql.filter(kv => queries.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release per-query scratch persists; shared memos live to clearAll
      Caches.clearTransient()
    }
    Caches.clearAll()
    spark.stop()
  }
}
