package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * synthetic test tables (TESTDATA.md), each paired (when SQL-expressible)
  * with DuckDB oracle SQL. The driver runs [[Verify]] to dump results and
  * compares against the oracle at sf0.01.
  */
object SparkEntry {

  /** All query registries, grouped by SURVEY.md §2 operator family. */
  def registries: Seq[Registry] = Seq(
    QFilters,
    QAudit,
    QJoins,
    QAggs,
    QWindows,
    QSetSortPivot,
    QScalar,
    QAsOf,
    QEnrich,
    QTracePipeline,
    QStage1,
    QBond,
    QBpe,
    QDedup,
    QSketch,
    QSimilarity,
    QText,
    QMultimodal,
    QStreaming
  )

  private lazy val all: Seq[Q] = registries.flatMap(_.qs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full Stage-0-shaped pipeline: clean → error-correct → daily panel.
    */
  def entry(spark: SparkSession): DataFrame =
    QTracePipeline.dailyPanel(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each fn first
    * ensures the library's native SQL functions exist in the session, so
    * queries work even when the caller's session wasn't built with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> { (s: SparkSession, d: String) =>
      GraftExtensions.ensure(s)
      q.fn(s, d)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Dev-loop subset filter shared by [[Verify]] and [[Bench]]: a
    * comma-separated query-name list in `envVar` restricts the run;
    * unset runs everything. Unknown names WARN to stderr — a typo that
    * silently filtered everything out would otherwise overwrite the
    * canonical artifacts with a plausible-looking empty run.
    */
  def filteredQueries(envVar: String)
      : Map[String, (SparkSession, String) => DataFrame] =
    sys.env.get(envVar)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(names) =>
        val unknown = names.diff(queries.keySet)
        if (unknown.nonEmpty)
          System.err.println(
            s"[$envVar] unknown query name(s): ${unknown.mkString(", ")}")
        queries.filter(kv => names(kv._1))
      case None => queries
    }
}
