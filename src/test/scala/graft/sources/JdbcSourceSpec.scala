package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S1 proper: the chunked-predicate `read.jdbc` path against an
  * in-process Derby database — one Spark partition per cusip chunk, and
  * DataFrame filters pushed into the JDBC WHERE clause (the pattern the
  * reference runs against WRDS).
  */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    // Derby refuses to create into an existing dir — point inside it
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE trace (
             cusip_id VARCHAR(9) NOT NULL,
             trd_exctn_dt DATE NOT NULL,
             rptd_pr DOUBLE NOT NULL)""")
      val ps = conn.prepareStatement("INSERT INTO trace VALUES (?, ?, ?)")
      for (i <- 0 until 400) {
        ps.setString(1, f"CUSIP${i % 20}%04d")
        ps.setDate(2, java.sql.Date.valueOf(s"2024-01-${i % 28 + 1}"))
        ps.setDouble(3, 90.0 + i % 40)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    u
  }

  private val cusips = (0 until 20).map(i => f"CUSIP$i%04d")

  test("one partition per cusip chunk; all rows arrive exactly once") {
    val preds = JdbcChunks.inListPredicates("cusip_id", cusips, chunkSize = 6)
    assert(preds.length == 4) // 20 cusips / 6 per chunk
    val df = JdbcChunks.read(spark, url, "trace", preds)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 400)
    // chunks partition the key space: no duplicates across predicates
    assert(df.select(col("cusip_id")).distinct().count() == 20)
  }

  test("DataFrame filters are pushed into the JDBC WHERE clause") {
    val preds = JdbcChunks.inListPredicates("cusip_id", cusips, chunkSize = 10)
    val df = JdbcChunks.read(spark, url, "trace", preds)
      .filter(col("rptd_pr") >= 100.0)
      .select(col("cusip_id"), col("rptd_pr"))
    val plan = df.queryExecution.executedPlan.toString
    // Derby uppercases unquoted identifiers: the pushed filter names
    // RPTD_PR. GreaterThanOrEqual in PushedFilters = the comparison ran
    // in the database, not in Spark.
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(RPTD_PR,100.0)"),
      s"expected RPTD_PR >= 100.0 in PushedFilters:\n$plan")
    // and the pushed read returns the right answer
    assert(df.count() ==
      (0 until 400).count(i => 90.0 + i % 40 >= 100.0))
  }

  test("IN-list predicates quote embedded quotes") {
    val preds = JdbcChunks.inListPredicates("k", Seq("o'brien", "plain"), 10)
    assert(preds.head == "k IN ('o''brien', 'plain')")
  }

  test("IN-list predicates refuse an empty key list") {
    // an empty predicates array would read 0 rows with no signal
    val err = intercept[IllegalArgumentException] {
      JdbcChunks.inListPredicates("k", Nil, 10)
    }
    assert(err.getMessage.contains("empty key list"))
  }
}
