package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated synthetic tables (see TESTDATA.md).
  *
  * Every query entry in [[SparkEntry.queries]] receives `(spark, sfDir)` and
  * loads inputs exclusively through these helpers so the scan configuration
  * (vectorized parquet reader, pushdown) is uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has shipped with two physical encodings of `ts` across
    // driver generations; nanosAsLong lets the nanos generation load at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalize `ts` across the encodings the driver has generated:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it natively; with
    *    nanosAsLong it surfaces as BIGINT nanos — rebuild micros with
    *    exact integer division (`div`, not `/`: int64 nanos ~1.7e18 exceed
    *    2^53, and a double round-trip can flip a microsecond boundary vs
    *    DuckDB's exact truncation).
    *  - TIMESTAMP(MICROS) unadjusted: surfaces as TIMESTAMP_NTZ — cast to
    *    the session-zone timestamp (session TZ is pinned to UTC everywhere,
    *    so the cast preserves the exact micros) so every downstream window
    *    function and oracle comparison sees one type regardless of encoding.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact decimal(18,2) sum of a double column, emitted as double.
    *
    * Plain `sum(double)` is order-dependent (~1e-11 relative drift at sf0.01),
    * which breaks the driver's hash compare against DuckDB. Summing after a
    * decimal(18,2) cast is exact and associative, and the final double cast is
    * deterministic IEEE-754 nearest — both engines produce identical bits.
    */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Same trick at 4 fractional digits (for products of 2-dp columns). */
  def dsum4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(28,4)")).cast("double")
}
