package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import org.apache.spark.sql.functions._

/** SQL DML on snapshot tables through the `graft_lake` path catalog and
  * the POSITION-DELTA row-level operation. Claims pinned:
  *
  *  - `DELETE FROM graft_lake.`dir` WHERE <arbitrary predicate>`
  *    commits ONE merge-on-read snapshot: every prior data entry is
  *    carried byte-identically (paths unchanged — ZERO rewrites), the
  *    delta is a position-delete vector, and both the SQL door and
  *    `readMor` serve the post-delete state;
  *  - `UPDATE` is delete + reinsert: old rows position-deleted, new
  *    rows in fresh data files, still zero rewrites;
  *  - `MERGE INTO` mixes matched-update / matched-delete / not-matched-
  *    insert in one statement and one commit;
  *  - time travel to the pre-DML snapshot serves the original rows;
  *  - a zero-match DML is a NO-OP (no new snapshot);
  *  - DML derived from a stale base fails loudly (OCC), never
  *    clobbers.
  */
class SqlDmlSpec extends SparkSpec {

  private def fresh(tag: String): (String, String) = {
    val dir = s"/tmp/graft-test/sqldml-$tag/t"
    graft.Scratch.clear(s"/tmp/graft-test/sqldml-$tag")
    (dir, s"graft_lake.`$dir`")
  }

  private def writeBase(dir: String): Int = {
    import spark.implicits._
    val base = (0L until 200L).map(i => (i, i % 4, i * 10))
      .toDF("id", "grp", "v")
    graft.operators.SnapshotMerge.writeInitial(spark, base, dir, "grp")
  }

  test("SQL DELETE: position vector, zero rewrites, both faces agree") {
    val (dir, tbl) = fresh("delete")
    val v1 = writeBase(dir)
    val v1Data = SnapshotLog.entries(dir, v1).map(_.path).toSet

    spark.sql(s"DELETE FROM $tbl WHERE id % 7 = 0 AND grp = 2")

    val v2 = SnapshotLog.latest(dir)
    assert(v2 == v1 + 1, "DELETE must commit exactly one snapshot")
    val es = SnapshotLog.entries(dir, v2)
    assert(es.filter(_.kind == "D").map(_.path).toSet == v1Data,
      "DELETE must rewrite ZERO data files (all entries shared)")
    assert(es.count(_.kind == "P") >= 1, "DELETE must commit a P vector")

    val expect = (0L until 200L).filterNot(i => i % 7 == 0 && i % 4 == 2)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(SnapshotLog.readMor(spark, dir, v2)) == expect)
    assert(ids(spark.sql(s"SELECT id FROM $tbl")) == expect,
      "the SQL door must serve its own delete")
    // time travel: the pre-DML snapshot is intact
    assert(SnapshotLog.readMor(spark, dir, v1).count() == 200)
  }

  test("SQL UPDATE: delete + reinsert, zero rewrites") {
    val (dir, tbl) = fresh("update")
    val v1 = writeBase(dir)
    val v1Data = SnapshotLog.entries(dir, v1).map(_.path).toSet

    spark.sql(s"UPDATE $tbl SET v = v + 1000000 WHERE id < 10")

    val v2 = SnapshotLog.latest(dir)
    val es = SnapshotLog.entries(dir, v2)
    assert(v1Data.subsetOf(es.filter(_.kind == "D").map(_.path).toSet),
      "UPDATE must carry every prior data file untouched")
    assert(es.count(_.kind == "P") >= 1 &&
      es.exists(e => e.kind == "D" && !v1Data(e.path)),
      "UPDATE = position deletes + fresh insert files")

    val got = spark.sql(s"SELECT sum(v) FROM $tbl").head.getLong(0)
    val want = (0L until 200L)
      .map(i => if (i < 10) i * 10 + 1000000 else i * 10).sum
    assert(got == want)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 200)
  }

  test("SQL MERGE INTO: update + delete + insert in one commit") {
    val (dir, tbl) = fresh("merge")
    val v1 = writeBase(dir)
    import spark.implicits._
    // src: ids 0..4 update, 100..104 delete, 1000..1002 insert
    ((0L until 5L).map(i => (i, 111L)) ++
      (100L until 105L).map(i => (i, -1L)) ++
      (1000L until 1003L).map(i => (i, 7L)))
      .toDF("id", "nv").createOrReplaceTempView("dml_src")

    spark.sql(
      s"""MERGE INTO $tbl t USING dml_src s ON t.id = s.id
          WHEN MATCHED AND s.nv < 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.nv
          WHEN NOT MATCHED THEN INSERT (id, grp, v)
            VALUES (s.id, s.id % 4, s.nv)""")

    val v2 = SnapshotLog.latest(dir)
    assert(v2 == v1 + 1, "MERGE must commit exactly one snapshot")
    val got = spark.sql(
      s"SELECT id, v FROM $tbl ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = ((0L until 200L).filterNot(i => 100L <= i && i < 105L)
      .map(i => (i, if (i < 5) 111L else i * 10)) ++
      (1000L until 1003L).map(i => (i, 7L))).sortBy(_._1)
    assert(got == want)
    // still zero rewrites
    val v1Data = SnapshotLog.entries(dir, v1).map(_.path).toSet
    assert(v1Data.subsetOf(SnapshotLog.entries(dir, v2)
      .filter(_.kind == "D").map(_.path).toSet))
  }

  test("SQL VERSION/TIMESTAMP AS OF: id, tag, branch, stamp, isolation") {
    import spark.implicits._
    val (dir, tbl) = fresh("timetravel")
    writeBase(dir)
    spark.sql(s"DELETE FROM $tbl WHERE id < 50")
    graft.operators.SnapshotRefs.tag(dir, "pin", 1)
    graft.operators.SnapshotRefs.createBranch(dir, "dev", 2)
    def n(sql: String) =
      spark.sql(s"SELECT count(*) FROM $sql").head.getLong(0)
    assert(n(s"$tbl VERSION AS OF 1") == 200)
    assert(n(s"$tbl VERSION AS OF 2") == 150)
    assert(n(s"$tbl VERSION AS OF 'pin'") == 200)
    assert(n(s"$tbl VERSION AS OF 'dev'") == 150)
    val t1 = SnapshotLog.tsOf(dir, 1).get
    val lit1 = java.time.Instant.ofEpochMilli(t1)
      .toString.replace("T", " ").stripSuffix("Z")
    assert(n(s"$tbl TIMESTAMP AS OF '$lit1'") == 200)
    // a branch-STAGED commit stays invisible to SQL time travel: its
    // stamp resolves to the published predecessor, and the head read
    // keeps serving the published line
    Seq((9999L, 1L, 1L)).toDF("id", "grp", "v")
      .write.format("graft-snapshot").option("path", dir)
      .option("branch", "dev").mode("append").save()
    val t3 = SnapshotLog.tsOf(dir, SnapshotLog.latest(dir)).get
    val lit3 = java.time.Instant.ofEpochMilli(t3)
      .toString.replace("T", " ").stripSuffix("Z")
    assert(n(s"$tbl TIMESTAMP AS OF '$lit3'") == 150,
      "SQL TIMESTAMP AS OF served a staged commit")
    assert(n(tbl) == 150)
    assert(n(s"$tbl VERSION AS OF 'dev'") == 151)
  }

  test("zero-match DML is a no-op; stacked DML composes") {
    val (dir, tbl) = fresh("noop")
    val v1 = writeBase(dir)
    spark.sql(s"DELETE FROM $tbl WHERE id > 99999")
    assert(SnapshotLog.latest(dir) == v1,
      "a zero-row DELETE must not mint a snapshot")
    // two stacked deletes: the second subtracts from the first's MOR
    // state (its scan already applies the first's position vector)
    spark.sql(s"DELETE FROM $tbl WHERE id < 10")
    spark.sql(s"DELETE FROM $tbl WHERE id < 20")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 180)
    assert(SnapshotLog.readMor(spark, dir, SnapshotLog.latest(dir))
      .agg(min(col("id"))).head.getLong(0) == 20L)
  }

  test("SQL INSERT INTO: values and subquery forms append one snapshot " +
      "each; DML over inserted rows composes") {
    val (dir, tbl) = fresh("insert")
    val v1 = writeBase(dir)
    spark.sql(s"INSERT INTO $tbl VALUES (1000, 9, 10000), (1001, 9, 10010)")
    val v2 = SnapshotLog.latest(dir)
    assert(v2 == v1 + 1, "INSERT must commit exactly one snapshot")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 202)
    // subquery form
    spark.sql(s"INSERT INTO $tbl SELECT id + 2000, 8, v FROM $tbl " +
      "WHERE id < 5")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 207)
    // DML sees the inserted rows
    spark.sql(s"DELETE FROM $tbl WHERE grp = 9")
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl WHERE id >= 1000 AND id < 2000")
      .head.getLong(0) == 0)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 205)
    // the pre-insert snapshot is intact
    assert(SnapshotLog.readMor(spark, dir, v1).count() == 200)
  }
}
