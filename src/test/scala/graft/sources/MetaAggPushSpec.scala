package graft.sources

import graft.SparkSpec
import graft.operators.{DeleteVectors, SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Aggregate pushdown to the MANIFEST (`SupportsPushDownAggregates`):
  * SQL `COUNT(*)` / `MIN` / `MAX` — optionally grouped by the
  * partition column, optionally under an exactly-label-decided WHERE —
  * are answered from manifest row counts and stats through the
  * STANDARD plan. Proven the s33/s55 way: the data files are DELETED
  * before the query, so any plan that opens one fails. Refusal cases
  * (equality vectors, missing counts, position deletes under MIN/MAX,
  * unanswerable aggregates) fall back to the real scan and match the
  * scan's own answer — never a wrong result.
  */
class MetaAggPushSpec extends SparkSpec {

  private def fresh(tag: String): (String, String) = {
    val dir = s"/tmp/graft-test/metaagg-$tag/t"
    graft.Scratch.clear(s"/tmp/graft-test/metaagg-$tag")
    (dir, s"graft_lake.`$dir`")
  }

  private def writeBase(dir: String,
      stats: Seq[String] = Seq("id", "name")): Int = {
    import spark.implicits._
    val base = (0L until 300L)
      .map(i => (i, i % 3, i * 10, f"n${i % 50}%03d"))
      .toDF("id", "grp", "v", "name")
    SnapshotMerge.writeInitial(spark, base, dir, "grp", statsCols = stats)
  }

  /** record the table's schema IN the manifest (the S40 face every
    * real table format has) so deleting the data files below leaves
    * schema resolution — like everything else on the plan path — a
    * pure metadata read. */
  private def recordSchema(dir: String): Int =
    SnapshotLog.commitSchemaChange(dir,
      SnapshotLog.read(spark, dir, SnapshotLog.latest(dir)).schema)

  private def deleteDataFiles(dir: String, v: Int): Unit =
    SnapshotLog.entries(dir, v).filter(_.kind == "D").foreach(e =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))

  private def isMetaAgg(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collectWithSubqueries {
      case b: BatchScanExec => b.scan
    }.exists(_.isInstanceOf[MetaAggScan])

  test("COUNT(*) GROUP BY partition served with every data file deleted") {
    val (dir, tbl) = fresh("count")
    writeBase(dir)
    val v1 = recordSchema(dir)
    deleteDataFiles(dir, v1)
    val df = spark.sql(s"SELECT grp, count(*) AS n FROM $tbl GROUP BY grp")
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(0L -> 100L, 1L -> 100L, 2L -> 100L))
    assert(isMetaAgg(df), "expected the manifest-served MetaAggScan")
  }

  test("global COUNT/MIN/MAX served from stats; files deleted first") {
    val (dir, tbl) = fresh("minmax")
    writeBase(dir)
    val v1 = recordSchema(dir)
    deleteDataFiles(dir, v1)
    val df = spark.sql(
      s"""SELECT count(*) AS n, min(id) AS lo, max(id) AS hi,
                 min(name) AS nlo, max(name) AS nhi FROM $tbl""")
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getString(4)) == ((300L, 0L, 299L, "n000", "n049")))
    assert(isMetaAgg(df))
  }

  test("COUNT(col) and SUM(col) served from null counts and sums; " +
      "files deleted first") {
    import spark.implicits._
    val (dir, tbl) = fresh("countcol")
    // `sparse` nulls every 7th row — COUNT(sparse) must subtract them
    val base = (0L until 300L).map(i => (i, i % 3,
      if (i % 7 == 0) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(i * 2)))
      .toDF("id", "grp", "sparse")
    SnapshotMerge.writeInitial(spark, base, dir, "grp",
      statsCols = Seq("id", "sparse"))
    val wantN = base.filter(org.apache.spark.sql.functions
      .col("sparse").isNotNull).count()
    val wantSum = base.agg(org.apache.spark.sql.functions
      .sum($"sparse")).head.getLong(0)
    val v1 = recordSchema(dir)
    deleteDataFiles(dir, v1)
    val df = spark.sql(
      s"""SELECT count(sparse) AS n, sum(id) AS sid,
                 sum(sparse) AS ss FROM $tbl""")
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((wantN, 300L * 299 / 2 * 2 / 2 * 2 / 2, wantSum)))
    assert(isMetaAgg(df), "COUNT(col)/SUM must be manifest-served")
    // grouped flavor too
    val g = spark.sql(s"SELECT grp, count(sparse) AS n, sum(id) AS s " +
      s"FROM $tbl GROUP BY grp")
    val got = g.collect().map(r2 =>
      (r2.getLong(0), r2.getLong(1), r2.getLong(2))).sortBy(_._1)
    val want = base.groupBy("grp").agg(
      org.apache.spark.sql.functions.count($"sparse"),
      org.apache.spark.sql.functions.sum($"id"))
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(isMetaAgg(g))
  }

  test("COUNT(col)/SUM refusals: position deletes, missing sums, and " +
      "a sum overflow all fall back to the scan") {
    import spark.implicits._
    val (dir, tbl) = fresh("countcol-refuse")
    val base = (0L until 100L).map(i => (i, i % 2, i * 3))
      .toDF("id", "grp", "v")
    SnapshotMerge.writeInitial(spark, base, dir, "grp",
      statsCols = Seq("id", "v"))
    // (a) position deletes: COUNT(col)/SUM refuse (dead rows' null-ness
    // and values are data questions) — answer comes from the real scan
    graft.operators.DeleteVectors.appendPositionDeletes(spark, dir,
      graft.operators.DeleteVectors.positionsOf(spark, dir, 1,
        $"id" % 10 === 0))
    val vP = SnapshotLog.latest(dir)
    val df = spark.sql(s"SELECT count(v) AS n, sum(v) AS s FROM $tbl")
    assert(!isMetaAgg(df), "deletes must refuse COUNT(col)/SUM pushdown")
    val r = df.head
    val live = SnapshotLog.readMor(spark, dir, vP)
    assert(r.getLong(0) == live.count())
    assert(r.getLong(1) == live.agg(
      org.apache.spark.sql.functions.sum($"v")).head.getLong(0))

    // (b) missing sums (legacy entries): refuse, scan answers
    val (dir2, tbl2) = fresh("countcol-legacy")
    val b2 = (0L until 50L).map(i => (i, i % 2)).toDF("id", "grp")
    SnapshotMerge.writeInitial(spark, b2, dir2, "grp") // no statsCols
    val df2 = spark.sql(s"SELECT sum(id) AS s FROM $tbl2")
    assert(!isMetaAgg(df2))
    assert(df2.head.getLong(0) == 49L * 50 / 2)

    // (c) OVERFLOW: hand-committed entries whose per-file sums are
    // near Long.Max — the eager fold throws at plan time and the
    // pushdown refuses (the scan then computes Spark's own ANSI-less
    // answer); never a silently wrapped manifest answer
    val (dir3, tbl3) = fresh("countcol-overflow")
    val b3 = Seq((Long.MaxValue / 2, 0L), (Long.MaxValue / 2, 1L))
      .toDF("id", "grp")
    SnapshotMerge.writeInitial(spark, b3, dir3, "grp",
      statsCols = Seq("id"))
    // two files, each sum ≈ Long.Max/2: the global fold overflows…
    // make it overflow for sure by doubling via a third entry
    val es3 = SnapshotLog.entries(dir3, 1)
    SnapshotLog.commitEntries(dir3, es3.map(e =>
      e.copy(sums = Map("id" -> (Long.MaxValue - 10)))),
      SnapshotLog.headers(dir3, 1))
    val df3 = spark.sql(s"SELECT sum(id) AS s FROM $tbl3")
    assert(!isMetaAgg(df3), "an overflowing fold must refuse pushdown")
  }

  test("COUNT(*) under an exact partition WHERE is served; files deleted") {
    val (dir, tbl) = fresh("where")
    writeBase(dir)
    val v1 = recordSchema(dir)
    deleteDataFiles(dir, v1)
    val df = spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE grp = 1")
    assert(df.head.getLong(0) == 100L)
    assert(isMetaAgg(df))
    val df2 = spark.sql(
      s"SELECT grp, count(*) AS n FROM $tbl WHERE grp IN (0, 2) GROUP BY grp")
    assert(df2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 100L, 2L -> 100L))
    assert(isMetaAgg(df2))
  }

  test("position-deleted table: COUNT exact, MIN/MAX refused but right") {
    val (dir, tbl) = fresh("posdel")
    writeBase(dir)
    recordSchema(dir)
    // SQL DELETE lands as a position-delete file (churn-sized metadata)
    spark.sql(s"DELETE FROM $tbl WHERE id % 5 = 0")
    val v2 = SnapshotLog.latest(dir)
    assert(SnapshotLog.entries(dir, v2).exists(_.kind == "P"))
    // MIN/MAX must REFUSE (the deleted row could be the extreme) and
    // fall back to the real scan — checked while files still exist
    val mm = spark.sql(s"SELECT min(id) AS lo, max(id) AS hi FROM $tbl")
    assert(!isMetaAgg(mm), "MIN/MAX over position deletes must not push")
    assert((mm.head.getLong(0), mm.head.getLong(1)) == ((1L, 299L)))
    // COUNT is exact from metadata: delete the data files, the
    // position-delete files stay (they are delete METADATA)
    deleteDataFiles(dir, v2)
    val df = spark.sql(s"SELECT grp, count(*) AS n FROM $tbl GROUP BY grp")
    assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 80L, 1L -> 80L, 2L -> 80L))
    assert(isMetaAgg(df))
  }

  test("equality-vectored table refuses pushdown; scan answer is right") {
    val (dir, tbl) = fresh("vec")
    val v1 = writeBase(dir)
    val base = SnapshotLog.read(spark, dir, v1)
    DeleteVectors.appendDeletes(spark, dir,
      base.filter(org.apache.spark.sql.functions.col("id") < 30)
        .select("id", "grp"))
    val df = spark.sql(s"SELECT count(*) AS n FROM $tbl")
    assert(!isMetaAgg(df), "vectored snapshots must refuse agg pushdown")
    assert(df.head.getLong(0) == 270L)
  }

  test("missing row counts refuse COUNT pushdown; scan answer is right") {
    val (dir, tbl) = fresh("nocounts")
    import spark.implicits._
    // the plain snapshot commit path records no row counts (rows = -1)
    val df0 = (0L until 40L).map(i => (i, i % 2)).toDF("id", "grp")
    val root = s"$dir/data/v1"
    df0.write.parquet(root)
    SnapshotLog.commitEntries(dir,
      SnapshotLog.dataFiles(root).map(f =>
        SnapshotLog.FileEntry(f, "D", "", Map.empty, seq = 1L)))
    val df = spark.sql(s"SELECT count(*) AS n FROM $tbl")
    assert(!isMetaAgg(df))
    assert(df.head.getLong(0) == 40L)
  }

  test("SUM and COUNT(col) refuse; fallback computes the right answer") {
    val (dir, tbl) = fresh("sum")
    writeBase(dir)
    val df = spark.sql(s"SELECT sum(v) AS sv, count(name) AS cn FROM $tbl")
    assert(!isMetaAgg(df))
    assert((df.head.getLong(0), df.head.getLong(1)) == ((448500L, 300L)))
  }

  test("pruned-away aggregates (count(), DISTINCT) still serve — " +
      "group-by-only and exists-row pushdown") {
    // a consumer that counts the faces (the probe's df.count()) makes
    // the optimizer prune every aggregate out of the pushed Aggregation
    // — the scan must serve the GROUPS (or the global aggregate's
    // always-one row) from metadata, not fall back to a scan of files
    // the fixture proved deleted
    val (dir, tbl) = fresh("emptyagg")
    writeBase(dir)
    val v1 = recordSchema(dir)
    deleteDataFiles(dir, v1)
    val d = spark.sql(s"SELECT DISTINCT grp FROM $tbl")
    assert(d.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(spark.sql(s"SELECT grp, count(*) AS n FROM $tbl GROUP BY grp")
      .count() == 3L)
    assert(spark.sql(s"SELECT min(id) AS lo FROM $tbl").count() == 1L)
  }

  test("a fully position-deleted partition produces NO group row") {
    val (dir, tbl) = fresh("deadgroup")
    writeBase(dir)
    recordSchema(dir)
    // the second conjunct forces the POSITION-delta path (a bare
    // grp = 1 would now take the metadata partition-drop, which this
    // test is not about)
    spark.sql(s"DELETE FROM $tbl WHERE grp = 1 AND id >= 0")
    deleteDataFiles(dir, SnapshotLog.latest(dir))
    val rows = spark.sql(
      s"SELECT grp, count(*) AS n FROM $tbl GROUP BY grp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(0L -> 100L, 2L -> 100L),
      s"a zero-live-row group must not surface; got $rows")
    assert(spark.sql(s"SELECT DISTINCT grp FROM $tbl")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L))
  }

  test("string-typed WHERE pushed through SQL prunes from string bounds") {
    // the ADVICE regression: Spark pushes StringType literals as
    // UTF8String — pruning must still fire. Proven by deleting the
    // files the bounds exclude, then answering through plain SQL.
    val (dir, tbl) = fresh("strpred")
    import spark.implicits._
    val base = (0 until 120).map { i =>
      val d = f"2024-${1 + i % 4}%02d-${1 + i % 28}%02d"
      (i.toLong, i % 4, d)
    }.toDF("id", "grp", "dt")
    SnapshotMerge.writeInitial(spark, base, dir, "grp",
      statsCols = Seq("dt"))
    val v1 = recordSchema(dir)
    val es = SnapshotLog.entries(dir, v1).filter(_.kind == "D")
    assert(es.forall(_.strStats.contains("dt")))
    // delete every file whose dt-bounds sit entirely below the cut
    val doomed = es.filter(e => !e.overlapsStr("dt", "2024-03-01", "￿"))
    assert(doomed.nonEmpty, "fixture must have prunable files")
    doomed.foreach(e =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(e.path)))
    val got = spark.sql(
      s"SELECT count(*) AS n FROM $tbl WHERE dt >= '2024-03-01'")
      .head.getLong(0)
    val want = (0 until 120).count(i =>
      f"2024-${1 + i % 4}%02d-${1 + i % 28}%02d" >= "2024-03-01")
    assert(got == want.toLong)
  }
}
