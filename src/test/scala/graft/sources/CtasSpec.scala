package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** Atomic CTAS / RTAS (`StagingTableCatalog`): `CREATE TABLE … AS
  * SELECT` publishes nothing until the staged commit (a failed SELECT
  * leaves NO committed table), `REPLACE TABLE … AS SELECT` swaps
  * content+schema as one snapshot with history retained, and the
  * staged writer records labels, row counts, bounds, null counts and
  * sums — a CTAS table prunes and answers metadata aggregates from
  * birth.
  */
class CtasSpec extends SparkSpec {

  private def fresh(tag: String): (String, String) = {
    val dir = s"/tmp/graft-test/ctas-$tag/t"
    graft.Scratch.clear(s"/tmp/graft-test/ctas-$tag")
    (dir, s"graft_lake.`$dir`")
  }

  test("CTAS commits one labeled stats-carrying snapshot") {
    val (dir, tbl) = fresh("basic")
    spark.range(0, 600)
      .selectExpr("id AS k", "id % 6 AS m", "id * 2 AS v")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE $tbl PARTITIONED BY (m) AS " +
      "SELECT * FROM ctas_src")
    assert(SnapshotLog.latest(dir) == 1)
    val es = SnapshotLog.entries(dir, 1)
    assert(es.nonEmpty && es.forall(_.kind == "D"))
    assert(es.forall(e => e.partition.startsWith("m=") && e.rows > 0 &&
      e.bytes > 0 && e.stats.contains("k") &&
      e.nullCounts.contains("k") && e.sums.contains("k")),
      s"CTAS entries must carry labels + full stats: ${es.head}")
    assert(SnapshotLog.specOf(dir, 1).contains("m"))
    assert(SnapshotLog.schemaOf(dir, 1).isDefined)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $tbl").head.getLong(0) ==
      2L * (599L * 600 / 2))
    // metadata COUNT path works from birth (labels + rows recorded)
    val byM = SnapshotLog.metaCount(spark, dir, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byM.values.sum == 600L && byM.size == 6)
  }

  test("a failing CTAS leaves NO committed table") {
    val (dir, tbl) = fresh("fail")
    val boom = org.apache.spark.sql.functions.udf((i: Long) =>
      if (i > 100) throw new RuntimeException("ctas-boom") else i)
    spark.udf.register("ctas_boom", boom)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $tbl AS " +
        "SELECT ctas_boom(id) AS k FROM range(0, 10000)")
    }
    assert(SnapshotLog.latest(dir) == 0,
      "a failed CTAS must leave zero committed state")
    // the directory is reusable immediately
    spark.sql(s"CREATE TABLE $tbl AS SELECT id AS k FROM range(0, 5)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == 5L)
  }

  test("RTAS replaces content and schema; history stays readable") {
    val (dir, tbl) = fresh("rtas")
    spark.sql(s"CREATE TABLE $tbl PARTITIONED BY (m) AS " +
      "SELECT id AS k, id % 3 AS m FROM range(0, 300)")
    val v1 = SnapshotLog.latest(dir)
    spark.sql(s"REPLACE TABLE $tbl AS " +
      "SELECT id AS kk, CAST(id AS DOUBLE) AS d FROM range(0, 40)")
    val v2 = SnapshotLog.latest(dir)
    assert(v2 == v1 + 1, "RTAS must be ONE snapshot commit")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == 40L)
    assert(spark.table(tbl).columns.toSeq == Seq("kk", "d"))
    // the pre-replace version reads under ITS schema
    val old = spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v1")
    assert(old.columns.toSeq == Seq("k", "m"))
    assert(old.count() == 300L)
    // REPLACE of a missing table refuses
    val (_, tbl2) = fresh("rtas-missing")
    val e = intercept[Exception](
      spark.sql(s"REPLACE TABLE $tbl2 AS SELECT 1 AS x"))
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND")
      || e.getMessage.toLowerCase.contains("not found"),
      s"got: ${e.getMessage}")
    // CREATE OR REPLACE works on both the missing and the existing
    spark.sql(s"CREATE OR REPLACE TABLE $tbl2 AS SELECT 1 AS x")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl2").head
      .getLong(0) == 1L)
    spark.sql(s"CREATE OR REPLACE TABLE $tbl2 AS " +
      "SELECT id AS y FROM range(0, 7)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl2").head
      .getLong(0) == 7L)
  }
}
