package graft.sources

import graft.SparkSpec
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._

/** Metadata-only SQL DELETE (`SupportsDeleteV2`): a value-set WHERE on
  * one column commits an EQUALITY-DELETE VECTOR — zero data files
  * opened (proven by hiding them during the DELETE), one tiny parquet
  * of the named values, rows correct through the MOR read and the
  * sequence rule (a later re-insert of a deleted key is served). Any
  * other predicate shape falls back to the row-level position-delta
  * path — a "P" entry, never a wrong answer.
  */
class DeleteWhereSpec extends SparkSpec {

  private def fresh(tag: String): (String, String) = {
    val dir = s"/tmp/graft-test/delwhere-$tag/t"
    graft.Scratch.clear(s"/tmp/graft-test/delwhere-$tag")
    (dir, s"graft_lake.`$dir`")
  }

  private def kinds(dir: String, v: Int): Map[String, Int] =
    SnapshotLog.entries(dir, v).groupBy(_.kind).map {
      case (k, es) => k -> es.size }

  test("IN-list DELETE commits a vector with the data files hidden") {
    import spark.implicits._
    val (dir, tbl) = fresh("inlist")
    val base = (0L until 400L).map(i => (i, i % 4, i * 3))
      .toDF("k", "m", "v")
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, 1).schema)
    val v0 = SnapshotLog.latest(dir)
    val files = SnapshotLog.files(dir, v0)
    // HIDE every data file: only a metadata-only plan can survive
    files.foreach { f =>
      java.nio.file.Files.move(java.nio.file.Paths.get(f),
        java.nio.file.Paths.get(f + ".hidden"))
    }
    try spark.sql(s"DELETE FROM $tbl WHERE k IN (3, 77, 250, 399)")
    finally files.foreach { f =>
      java.nio.file.Files.move(java.nio.file.Paths.get(f + ".hidden"),
        java.nio.file.Paths.get(f))
    }
    val v1 = SnapshotLog.latest(dir)
    assert(v1 == v0 + 1, "the DELETE must commit exactly one snapshot")
    assert(kinds(dir, v1).getOrElse("X", 0) == 1,
      s"expected one equality vector; got ${kinds(dir, v1)}")
    assert(kinds(dir, v1).getOrElse("P", 0) == 0)
    // rows: MOR read equals the filtered oracle
    val got = spark.sql(s"SELECT sum(v) AS s, count(*) AS n FROM $tbl")
      .head
    val want = base.filter(!$"k".isin(3L, 77L, 250L, 399L))
      .agg(sum($"v"), count(lit(1))).head
    assert((got.getLong(0), got.getLong(1)) ==
      ((want.getLong(0), want.getLong(1))))
    // seq scoping: re-inserting a deleted key SERVES it again
    Seq((3L, 3L, 999L)).toDF("k", "m", "v").write
      .format("graft-snapshot").option("path", dir).mode("append").save()
    val re = spark.sql(s"SELECT v FROM $tbl WHERE k = 3")
      .collect().map(_.getLong(0)).toSeq
    assert(re == Seq(999L), s"re-inserted key must be served: $re")
  }

  test("equality DELETE on a string column is also metadata-only") {
    import spark.implicits._
    val (dir, tbl) = fresh("string")
    val base = (0L until 100L).map(i => (i, i % 2, s"u${i % 10}"))
      .toDF("k", "m", "tag")
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, 1).schema)
    val v0 = SnapshotLog.latest(dir)
    spark.sql(s"DELETE FROM $tbl WHERE tag = 'u3'")
    val v1 = SnapshotLog.latest(dir)
    assert(kinds(dir, v1).getOrElse("X", 0) == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == base.filter($"tag" =!= "u3").count())
  }

  test("DELETE on the partition column DROPS entries — no vector, " +
      "aggregate pushdown keeps working") {
    import spark.implicits._
    val (dir, tbl) = fresh("partdrop")
    val base = (0L until 300L).map(i => (i, i % 3, i * 2))
      .toDF("k", "m", "v")
    SnapshotMerge.writeInitial(spark, base, dir, "m",
      statsCols = Seq("k"))
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, 1).schema)
    val v0 = SnapshotLog.latest(dir)
    val files = SnapshotLog.files(dir, v0)
    files.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(f), java.nio.file.Paths.get(f + ".h")))
    try spark.sql(s"DELETE FROM $tbl WHERE m = 1")
    finally files.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(f + ".h"), java.nio.file.Paths.get(f)))
    val v1 = SnapshotLog.latest(dir)
    assert(v1 == v0 + 1)
    assert(kinds(dir, v1) == Map("D" ->
      SnapshotLog.entries(dir, v0).count(e =>
        e.kind == "D" && e.partition != "m=1")),
      s"partition-label DELETE must DROP entries: ${kinds(dir, v1)}")
    // no vector was introduced, so metadata COUNT still serves
    val counted = SnapshotLog.metaCount(spark, dir, v1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counted == Map("m=0" -> 100L, "m=2" -> 100L))
    // zero-match label delete commits NOTHING
    spark.sql(s"DELETE FROM $tbl WHERE m = 99")
    assert(SnapshotLog.latest(dir) == v1, "no-match DELETE must no-op")
    // and rows are right
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == 200L)
  }

  test("non-set predicates fall back to the position-delta path") {
    import spark.implicits._
    val (dir, tbl) = fresh("fallback")
    val base = (0L until 200L).map(i => (i, i % 4, i * 2))
      .toDF("k", "m", "v")
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, 1).schema)
    // a RANGE is not a value set: row-level path, "P" entry
    spark.sql(s"DELETE FROM $tbl WHERE k >= 190")
    val v1 = SnapshotLog.latest(dir)
    assert(kinds(dir, v1).getOrElse("P", 0) >= 1,
      s"range DELETE must take the position path: ${kinds(dir, v1)}")
    assert(kinds(dir, v1).getOrElse("X", 0) == 0)
    // a MULTI-COLUMN conjunction: row-level path too
    spark.sql(s"DELETE FROM $tbl WHERE k IN (5, 6) AND m = 1")
    val v2 = SnapshotLog.latest(dir)
    assert(kinds(dir, v2).getOrElse("X", 0) == 0)
    val got = spark.sql(s"SELECT sum(v) AS s, count(*) AS n FROM $tbl")
      .head
    val want = base.filter($"k" < 190)
      .filter(!($"k".isin(5L, 6L) && $"m" === 1L))
      .agg(sum($"v"), count(lit(1))).head
    assert((got.getLong(0), got.getLong(1)) ==
      ((want.getLong(0), want.getLong(1))))
  }

  test("DELETE on ONE component of a multi-column label DROPS entries") {
    import spark.implicits._
    val (dir, tbl) = fresh("multidrop")
    val base = (0L until 360L).map(i => (i, i % 3, i % 2, i * 2))
      .toDF("k", "m", "g", "v")
    SnapshotMerge.writeInitialMulti(spark, base, dir, Seq("m", "g"))
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, 1).schema)
    val v0 = SnapshotLog.latest(dir)
    // every entry carries the ordered two-segment label
    assert(SnapshotLog.entries(dir, v0).filter(_.kind == "D").forall(e =>
      SnapshotLog.labelColsOf(e.partition) == Seq("m", "g")))
    val files = SnapshotLog.files(dir, v0)
    // files HIDDEN: only a metadata-only plan can survive
    files.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(f), java.nio.file.Paths.get(f + ".h")))
    try {
      // the FIRST label component drops entries (label purity holds
      // per segment)...
      spark.sql(s"DELETE FROM $tbl WHERE m = 1")
      // ...and so does the SECOND
      spark.sql(s"DELETE FROM $tbl WHERE g = 0")
    } finally files.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(f + ".h"), java.nio.file.Paths.get(f)))
    val v2 = SnapshotLog.latest(dir)
    assert(kinds(dir, v2).getOrElse("X", 0) == 0 &&
      kinds(dir, v2).getOrElse("P", 0) == 0,
      s"multi-label component DELETEs must DROP, not vector: " +
        s"${kinds(dir, v2)}")
    assert(SnapshotLog.entries(dir, v2).filter(_.kind == "D").forall(e =>
      SnapshotLog.labelValueOf(e.partition, "m").exists(_ != "1") &&
        SnapshotLog.labelValueOf(e.partition, "g").exists(_ != "0")))
    // the surviving rows are exactly the SQL answer
    val got = spark.sql(s"SELECT sum(v) AS s, count(*) AS n FROM $tbl")
      .head
    val want = base.filter($"m" =!= 1L && $"g" =!= 0L)
      .agg(sum($"v"), count(lit(1))).head
    assert((got.getLong(0), got.getLong(1)) ==
      ((want.getLong(0), want.getLong(1))))
  }
}
