package graft.sources

import graft.SparkSpec
import graft.operators.{DeleteVectors, SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The VECTORIZED snapshot scan:
  *
  *  1. a vector-free snapshot executes COLUMNAR (ColumnarBatch input to
  *     codegen — `BatchScanExec.supportsColumnar`), and equals the
  *     row-path oracle;
  *  2. position deletes apply as a per-batch row-index MASK on the
  *     columnar path — results equal `readMor`, `_pos` stays the
  *     PHYSICAL index;
  *  3. a big multi-row-group file SPLITS into several byte-range tasks
  *     (each row group served exactly once); tiny files COALESCE into
  *     shared tasks — counts and sums unchanged by either;
  *  4. an equality-vectored snapshot falls back to the row path (per-
  *     row key probes), still correct.
  */
class ColumnarScanSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val base = s"/tmp/graft-test/colscan-$tag"
    graft.Scratch.clear(base)
    s"$base/t"
  }

  private def deepScan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      deepScan(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      deepScan(s.plan)
    case b: BatchScanExec => Seq(b)
    case other => other.children.flatMap(deepScan)
  }

  private def scanExec(df: DataFrame): BatchScanExec = {
    df.collect()
    deepScan(df.queryExecution.executedPlan).head
  }

  test("vector-free scan is columnar and equals the row oracle") {
    import spark.implicits._
    val dir = fresh("basic")
    val base = (0L until 5000L)
      .map(i => (i, (i % 7).toInt, i * 0.5, s"s$i"))
      .toDF("id", "m", "v", "s")
    SnapshotMerge.writeInitial(spark,
      base.withColumn("m", col("m").cast("long")), dir, "m")
    val df = spark.read.format("graft-snapshot").option("path", dir).load()
    val b = scanExec(df)
    assert(b.supportsColumnar,
      "a vector-free snapshot scan must serve ColumnarBatches")
    val got = df.agg(count(lit(1)), sum(col("id")), sum(col("v")),
      countDistinct(col("s"))).head
    assert((got.getLong(0), got.getLong(1), got.getDouble(2),
      got.getLong(3)) ==
      ((5000L, 5000L * 4999 / 2, 0.5 * (5000L * 4999 / 2), 5000L)))
  }

  test("position deletes mask columnar batches; _pos stays physical") {
    import spark.implicits._
    val dir = fresh("posdel")
    val base = (0L until 4000L).map(i => (i, i % 3)).toDF("id", "g")
    base.coalesce(2).write.parquet(s"$dir/data")
    val files = SnapshotLog.dataFiles(s"$dir/data")
    SnapshotLog.commitEntries(dir, files.map(f =>
      SnapshotLog.FileEntry(f, "D", "", Map.empty, seq = 1L,
        rows = -1L, bytes = SnapshotLog.statBytes(f))))
    // delete positions 0, 1, and every 13th row of the FIRST file
    val f0 = files.head
    val n0 = spark.read.parquet(f0).count()
    val deadPos = (0L until n0).filter(p => p < 2 || p % 13 == 0)
    deadPos.map(p => (f0, p)).toDF("file_path", "row_pos")
      .coalesce(1).write.parquet(s"$dir/deletes")
    val pd = SnapshotLog.dataFiles(s"$dir/deletes")
    SnapshotLog.commitEntries(dir,
      SnapshotLog.entries(dir, 1) ++ pd.map(f =>
        SnapshotLog.FileEntry(f, "P", "", Map.empty, seq = 2L,
          bytes = SnapshotLog.statBytes(f))))

    val df = spark.read.format("graft-snapshot").option("path", dir).load()
    val b = scanExec(df)
    assert(b.supportsColumnar,
      "position deletes must not force the row path")
    assert(df.count() == 4000L - deadPos.size)
    assert(df.count() == SnapshotLog.readMor(spark, dir, 2).count())
    // _pos is the PHYSICAL index: surviving rows of file 0 skip the
    // masked positions exactly
    val posCol = df.select(col(SnapshotDelta.FileCol).as("f"),
      col(SnapshotDelta.PosCol).as("p"))
      .filter(col("f") === f0).select("p").as[Long].collect().sorted
    val want = (0L until n0).filterNot(deadPos.toSet)
    assert(posCol.toSeq == want,
      s"masked _pos mismatch: got ${posCol.take(5).toSeq}… " +
        s"want ${want.take(5)}…")
  }

  test("a big file splits into byte-range tasks; rows served once") {
    import spark.implicits._
    val dir = fresh("split")
    // many small row groups so byte ranges can land mid-file
    (0L until 200000L).map(i => (i, i * 2)).toDF("id", "v")
      .coalesce(1).write.option("parquet.block.size", "65536")
      .parquet(s"$dir/data")
    val f = SnapshotLog.dataFiles(s"$dir/data").head
    SnapshotLog.commitEntries(dir, Seq(
      SnapshotLog.FileEntry(f, "D", "", Map.empty, seq = 1L,
        rows = 200000L, bytes = SnapshotLog.statBytes(f))))
    val df = spark.read.format("graft-snapshot").option("path", dir)
      .option("splitTargetBytes", (256 * 1024).toString).load()
    val b = scanExec(df)
    val parts = b.partitions.flatten
      .collect { case p: SnapFilePartition => p }
    assert(parts.size > 1,
      s"a ${SnapshotLog.statBytes(f)}-byte file at a 256 KiB target " +
        "must plan several byte-range tasks")
    assert(parts.flatMap(_.chunks).forall(_.path == f))
    val got = df.agg(count(lit(1)), sum(col("id")), sum(col("v"))).head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((200000L, 200000L * 199999 / 2, 2L * (200000L * 199999 / 2))),
      "byte-range splits must serve every row group exactly once")
  }

  test("tiny files coalesce into shared tasks; counts unchanged") {
    import spark.implicits._
    val dir = fresh("coalesce")
    val df0 = (0L until 1200L).map(i => (i, i % 12)).toDF("k", "m")
    SnapshotMerge.writeInitial(spark, df0, dir, "m")
    val nFiles = SnapshotLog.files(dir, 1).size
    assert(nFiles >= 12)
    val df = spark.read.format("graft-snapshot").option("path", dir).load()
    val b = scanExec(df)
    val parts = b.partitions.flatten
      .collect { case p: SnapFilePartition => p }
    assert(parts.size < nFiles,
      s"$nFiles tiny files must coalesce into fewer tasks " +
        s"(got ${parts.size})")
    assert(parts.flatMap(_.paths).sorted ==
      SnapshotLog.files(dir, 1).sorted,
      "every file exactly once across the coalesced tasks")
    assert(df.count() == 1200L)
  }

  test("equality vectors probe columnar batches; results stay " +
      "MOR-exact incl. re-inserts and pruned key columns") {
    import spark.implicits._
    val dir = fresh("eqvec")
    val base = (0L until 500L).map(i => (i, i % 5, i * 3))
      .toDF("id", "m", "v")
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    DeleteVectors.appendDeletes(spark, dir,
      (0L until 500L by 9L).map(i => (i, i % 5)).toDF("id", "m"))
    // re-insert some deleted keys LATER: the older vector must not
    // suppress them (seq scoping through the columnar probe)
    Seq((9L, 4L, 777L), (18L, 3L, 888L)).toDF("id", "m", "v")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    val vN = SnapshotLog.latest(dir)
    val df = spark.read.format("graft-snapshot").option("path", dir).load()
    val b = scanExec(df)
    assert(b.supportsColumnar,
      "equality vectors must ride the columnar path as batch probes")
    val mor = SnapshotLog.readMor(spark, dir, vN)
    assert(df.count() == mor.count())
    assert(df.agg(sum(col("v"))).head.getLong(0) ==
      mor.agg(sum(col("v"))).head.getLong(0))
    // key columns pruned from the OUTPUT still probe: project only v
    val onlyV = df.select("v")
    assert(onlyV.count() == mor.count())
    assert(onlyV.agg(sum(col("v"))).head.getLong(0) ==
      mor.agg(sum(col("v"))).head.getLong(0))
    // the re-inserted keys are served
    assert(df.filter(col("id") === 9L).select("v").as[Long]
      .collect().toSeq == Seq(777L))
  }

  test("single-LONG-key vectors take the primitive probe; MOR-exact") {
    import spark.implicits._
    val dir = fresh("longvec")
    val base = (0L until 600L).map(i => (i, i % 6, i * 7))
      .toDF("id", "m", "v")
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    // ONE key column (long) — the fast-path shape
    DeleteVectors.appendDeletes(spark, dir,
      (0L until 600L by 11L).toDF("id"))
    Seq((11L, 2L, 31415L)).toDF("id", "m", "v")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    val vN = SnapshotLog.latest(dir)
    // the cached vector exposes the primitive set (the probe the scan
    // takes), and the scan's answers stay MOR-exact through it
    val vecPath = SnapshotLog.entries(dir, vN)
      .find(_.kind == "X").get.path
    assert(EqVectors.load(vecPath).singleLongSet != null,
      "a single-long-key vector must build the primitive probe set")
    val df = spark.read.format("graft-snapshot").option("path", dir).load()
    val mor = SnapshotLog.readMor(spark, dir, vN)
    assert(scanExec(df).supportsColumnar)
    assert(df.count() == mor.count())
    assert(df.agg(sum(col("v"))).head.getLong(0) ==
      mor.agg(sum(col("v"))).head.getLong(0))
    assert(df.filter(col("id") === 11L).select("v").as[Long]
      .collect().toSeq == Seq(31415L), "re-inserted key served")
    assert(df.filter(col("id") === 22L).count() == 0L,
      "vectored key suppressed")
  }

  test("masked vectors report EXACT null counts over live rows") {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.types.LongType
    val base = new OnHeapColumnVector(8, LongType)
    (0 until 8).foreach { i =>
      if (i == 2 || i == 5) base.putNull(i) else base.putLong(i, i * 10L)
    }
    assert(base.hasNull && base.numNulls() == 2)
    val masked = new MaskedColumnVector(base)
    // mask away BOTH null rows: the view must report zero nulls
    masked.set(Array(0, 1, 3, 4, 6, 7), 6)
    assert(!masked.hasNull, "nulls only in deleted rows: hasNull false")
    assert(masked.numNulls() == 0)
    // keep one null row: exactly one
    masked.set(Array(0, 2, 3), 3)
    assert(masked.hasNull && masked.numNulls() == 1)
    assert(masked.isNullAt(1) && !masked.isNullAt(0))
    base.close()
  }
}
