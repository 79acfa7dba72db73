package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 proper — the chunked-predicate JDBC read the reference does against
  * WRDS (`stage0/create_daily_enhanced_trace.py:499-508`: the trade pull
  * is issued as one query per cusip chunk so no single result set
  * overwhelms the connection).
  *
  * Spark-native shape: `spark.read.jdbc(url, table, predicates, props)` —
  * ONE partition per predicate, each executor opening its own connection
  * and fetching only its chunk's rows; DataFrame filters/projections on
  * top are pushed into each partition's WHERE clause by the JDBC source
  * (visible as `PushedFilters` in the scan node). That is exactly the
  * reference's chunk loop, parallelized and with the scan pruned at the
  * database, not in the driver.
  *
  * `JdbcSourceSpec` exercises the path end-to-end against an in-process
  * Derby database (the JDBC engine on the Spark classpath).
  */
object JdbcChunks {

  /** IN-list predicates from key chunks — the reference's chunking unit.
    * Keys are SQL-quoted; one predicate (= one Spark partition / one DB
    * query) per chunk.
    */
  def inListPredicates(keyCol: String, keys: Seq[String],
      chunkSize: Int): Array[String] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    // an empty predicates array makes spark.read.jdbc build a ZERO-
    // partition relation — the pipeline would proceed on 0 rows with no
    // signal that the chunk list (not the table) was empty
    require(keys.nonEmpty,
      s"empty key list for '$keyCol' — an empty predicates array reads 0 rows silently")
    keys.distinct.sorted.grouped(chunkSize).map { chunk =>
      s"$keyCol IN (${chunk.map(k => s"'${k.replace("'", "''")}'").mkString(", ")})"
    }.toArray
  }

  /** Chunk-parallel JDBC read: one partition per predicate. */
  def read(spark: SparkSession, url: String, table: String,
      predicates: Array[String],
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, predicates, props)
}
