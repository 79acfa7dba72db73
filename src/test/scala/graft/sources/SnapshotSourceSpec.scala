package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.{DeleteVectors, SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The `graft-snapshot` DSv2 source (s39_version_as_of_sql /
  * stream_change_feed) — the connector contracts:
  *
  *  1. BATCH plan pin: the scan plans EXACTLY the pinned manifest's
  *     files (input partitions == manifest data entries — no directory
  *     walk), and two versions of the SAME SQL text read different
  *     file sets.
  *  2. A snapshot carrying live delete vectors reads MERGE-ON-READ
  *     through the scan: seq-scoped equality vectors and position
  *     deletes apply inside each file's reader, scan == readMor.
  *  3. STREAMING exactly-once: a restart from the checkpoint with no
  *     new commit delivers NOTHING (replayed epoch no-op); a new
  *     commit afterwards delivers exactly its delta; the union of all
  *     streamed deltas equals the batch diff.
  *  4. A copy-on-write rewrite commit fails the stream loudly — its
  *     U/D split needs the batch changeFeed, and silently emitting it
  *     as inserts would double rows.
  */
class SnapshotSourceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def mkBase() = Tables.lineitem(spark, sf).select(
    col("l_orderkey"), col("l_linenumber"),
    col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
    month(to_date(col("l_shipdate"))).as("m"))

  test("batch face plans exactly the manifest's files; versions differ") {
    val dir = s"${graft.Scratch.dirFor("snapsrc_batch", sf)}/t"
    graft.Scratch.clear(dir)
    val base = mkBase()
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val src = SnapshotLog.read(spark, dir, v1).filter(col("m") === 2)
    val deletes = src.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v2 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes,
      deletes.filter(lit(false)).withColumn("new_qty", lit(0)),
      deletes.filter(lit(false)).withColumn("qty", lit(0))
        .select("l_orderkey", "l_linenumber", "qty", "m"),
      Map("qty" -> "new_qty"))

    def scanOf(v: Int) = {
      val df = spark.read.format("graft-snapshot")
        .option("path", dir).option("versionAsOf", v.toString).load()
      val files = df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.partitions.flatten
          .collect { case p: SnapFilePartition => p.paths }
          .flatten.sorted
      }
      (df, files.getOrElse(fail("no BatchScanExec in the plan")))
    }
    val (df1, files1) = scanOf(v1)
    val (df2, files2) = scanOf(v2)
    // the scan plans EXACTLY the manifest's data files (small files
    // may share a task, but each file is read exactly once)
    assert(files1 == SnapshotLog.files(dir, v1).sorted,
      "the scan must plan exactly the manifest's data files")
    assert(files2 == SnapshotLog.files(dir, v2).sorted)

    // values equal the engine's own snapshot reads, per version
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("qty")).cast("long")).head
    assert(agg(df1) == agg(SnapshotLog.read(spark, dir, v1)))
    assert(agg(df2) == agg(SnapshotLog.read(spark, dir, v2)))
    assert(agg(df1) != agg(df2),
      "the same SQL text at two versions must see different tables")
  }

  test("a vectored snapshot reads merge-on-read through the scan: " +
      "scan == readMor, seq scoping serves re-inserts, count(*) prunes") {
    val dir = s"${graft.Scratch.dirFor("snapsrc_vec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = mkBase()
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    // vector 1: a spread of keys across partitions
    DeleteVectors.appendDeletes(spark, dir,
      SnapshotLog.read(spark, dir, v1)
        .filter(col("l_orderkey") % 19 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("m")))
    // RE-INSERT some deleted keys in a LATER commit: the older vector
    // must not suppress them (seq scoping — the Iceberg rule)
    val reins = base.filter(col("l_orderkey") % 19 === 0)
      .limit(7).withColumn("qty", lit(777))
    reins.write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    // vector 2 on top: different key subset
    DeleteVectors.appendDeletes(spark, dir,
      SnapshotLog.read(spark, dir, v1)
        .filter(col("l_orderkey") % 23 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("m")))
    val vN = SnapshotLog.latest(dir)

    val scan = spark.read.format("graft-snapshot").option("path", dir)
      .load().select("l_orderkey", "l_linenumber", "qty", "m")
    val mor = SnapshotLog.readMor(spark, dir, vN)
      .select("l_orderkey", "l_linenumber", "qty", "m")
    assert(scan.exceptAll(mor).count() == 0 &&
      mor.exceptAll(scan).count() == 0,
      "vector-aware scan diverged from readMor")
    assert(scan.filter(col("qty") === 777).count() > 0,
      "re-inserted keys must be served (seq scoping)")
    // the all-pruned projection (count(*)) must still apply vectors —
    // key columns widen the parquet projection, not the output
    assert(scan.count() == mor.count())
  }

  test("rename-aware scan: pre-rename files serve the renamed column") {
    import spark.implicits._
    val dir = s"${graft.Scratch.dirFor("snapsrc_ren", sf)}/t"
    graft.Scratch.clear(dir)
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "val", "tag")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    SnapshotLog.commitSchemaChange(dir,
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, amount BIGINT, tag STRING"),
      renames = Map("val" -> "amount"))
    // post-rename append writes the NEW name
    Seq((3L, 30L, "c")).toDF("k", "amount", "tag")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    val got = spark.read.format("graft-snapshot").option("path", dir)
      .load().select("k", "amount", "tag")
    val want = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "amount", "tag")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      s"rename-aware read diverged: ${got.collect().mkString(";")}")
    // and a vector written against the CANONICAL name still deletes
    // rows living in pre-rename files
    DeleteVectors.appendDeletes(spark, dir,
      Seq((1L)).toDF("k"))
    val after = spark.read.format("graft-snapshot").option("path", dir)
      .load().select("k", "amount", "tag")
    assert(after.count() == 2 &&
      after.filter(col("k") === 1L).count() == 0,
      "canonical-name vector must delete pre-rename rows")
  }

  test("stream: replayed epoch is a no-op; a new commit streams its delta") {
    val dir = s"${graft.Scratch.dirFor("snapsrc_stream", sf)}/t"
    graft.Scratch.clear(dir)
    val out = s"${graft.Scratch.dirFor("snapsrc_stream", sf)}/out"
    val ckpt = s"${graft.Scratch.dirFor("snapsrc_stream", sf)}/ckpt"
    graft.Scratch.clear(out); graft.Scratch.clear(ckpt)
    val base = mkBase()
    SnapshotMerge.writeInitial(spark,
      base.filter(col("l_orderkey") % 3 =!= 0), dir, "m")
    graft.streaming.SnapshotCommitSink.commitBatch(spark, dir,
      base.filter(col("l_orderkey") % 3 === 0), 0L)

    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", dir).option("changeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == base.count(), "first drain must stream every commit")

    // replay: no new commit — the restarted stream must add NOTHING
    drain()
    assert(spark.read.parquet(out).count() == n1,
      "a replayed epoch re-delivered rows")

    // a delete commit afterwards streams exactly its keys as D ops
    DeleteVectors.appendDeletes(spark, dir,
      base.filter(col("l_orderkey") % 19 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("m")))
    drain()
    val all = spark.read.parquet(out)
    val dRows = all.filter(col("_op") === "D")
    assert(all.count() == n1 + dRows.count())
    val wantD = base.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m")).distinct()
    val gotD = dRows.select(col("l_orderkey"), col("l_linenumber"), col("m"))
    assert(gotD.exceptAll(wantD).count() == 0 &&
      wantD.exceptAll(gotD).count() == 0,
      "streamed D ops must equal the vector's distinct keys")

    // union of streamed deltas == the batch state: I rows minus D keys
    val iRows = all.filter(col("_op") === "I")
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    val folded = iRows.join(gotD,
      Seq("l_orderkey", "l_linenumber", "m"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    val want = SnapshotLog.readMor(spark, dir, SnapshotLog.latest(dir))
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(folded.exceptAll(want).count() == 0 &&
      want.exceptAll(folded).count() == 0,
      "folded stream deltas diverged from the table's batch state")
  }

  test("a KEYED table streams a COW merge as the exact U/D/I split") {
    val dir = s"${graft.Scratch.dirFor("snapsrc_usplit", sf)}/t"
    graft.Scratch.clear(dir)
    val out = s"${graft.Scratch.dirFor("snapsrc_usplit", sf)}/out"
    val ckpt = s"${graft.Scratch.dirFor("snapsrc_usplit", sf)}/ckpt"
    graft.Scratch.clear(out); graft.Scratch.clear(ckpt)
    val base = mkBase()
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    SnapshotLog.commitKeysChange(dir,
      Seq("l_orderkey", "l_linenumber", "m"))

    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", dir).option("changeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // v1 inserts + the metadata-only keys commit (empty delta)
    val n1 = spark.read.parquet(out).count()
    assert(n1 == base.count())

    // the COW merge: deletes + updates + inserts in months 2-3
    val src = SnapshotLog.read(spark, dir, v1).filter(col("m").isin(2, 3))
    val deletes = src.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val updates = src.filter(col("l_orderkey") % 19 =!= 0 &&
        col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        (col("l_orderkey") % 47 + 1).cast("int").as("new_qty"))
    val inserts = src.filter(col("l_orderkey") % 19 =!= 0 &&
        col("l_orderkey") % 13 =!= 0 && col("l_orderkey") % 17 === 0)
      .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
        col("l_linenumber"), col("qty"), col("m"))
    val v3 = SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes, updates, inserts,
      Map("qty" -> "new_qty"))

    drain() // must now serve the rewrite as a U-split, not refuse
    val delta = spark.read.parquet(out).filter(col("_commit") === v3)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"), col("_op"))

    // independent expectation: full-row multiset diff of the two
    // snapshots, folded per key (computed WITHOUT the operator)
    val o = SnapshotLog.read(spark, dir, v1)
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("m"),
        col("qty")).agg(count(lit(1)).as("n_o"))
    val n = SnapshotLog.read(spark, dir, v3)
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("m"),
        col("qty")).agg(count(lit(1)).as("n_n"))
    val want = o.join(n,
        Seq("l_orderkey", "l_linenumber", "m", "qty"), "full_outer")
      .na.fill(0L, Seq("n_o", "n_n"))
      .filter(col("n_o") =!= col("n_n"))
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("m"))
      .agg(sum(col("n_o")).as("o"), sum(col("n_n")).as("n"))
      .withColumn("_op", when(col("n") === 0, "D")
        .when(col("o") === 0, "I").otherwise("U"))
      .select(col("l_orderkey"), col("l_linenumber"), col("m"), col("_op"))
    assert(delta.exceptAll(want).count() == 0 &&
      want.exceptAll(delta).count() == 0,
      "streamed U-split diverged from the multiset snapshot diff")
    assert(delta.filter(col("_op") === "U").count() > 0 &&
      delta.filter(col("_op") === "D").count() > 0 &&
      delta.filter(col("_op") === "I").count() > 0,
      "fixture must exercise all three ops")

    // a COMPACTION-shaped rewrite (zero logical change) streams EMPTY
    DeleteVectors.appendDeletes(spark, dir,
      SnapshotLog.read(spark, dir, v3).limit(3)
        .select(col("l_orderkey"), col("l_linenumber"), col("m")))
    DeleteVectors.compact(spark, dir, "m")
    val before = spark.read.parquet(out).count()
    drain()
    val tail = spark.read.parquet(out)
      .filter(col("_commit") > v3)
    // the vector commit streams its 3 keys as D; the compaction adds 0
    assert(tail.count() == 3 && tail.filter(col("_op") === "D").count() == 3,
      s"got ${tail.collect().mkString(";")} after $before")
  }

  test("a copy-on-write rewrite commit fails the stream loudly") {
    val dir = s"${graft.Scratch.dirFor("snapsrc_cow", sf)}/t"
    graft.Scratch.clear(dir)
    val base = mkBase()
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val deletes = SnapshotLog.read(spark, dir, v1)
      .filter(col("m") === 2 && col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes,
      deletes.filter(lit(false)).withColumn("new_qty", lit(0)),
      deletes.filter(lit(false)).withColumn("qty", lit(0))
        .select("l_orderkey", "l_linenumber", "qty", "m"),
      Map("qty" -> "new_qty"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", dir).option("changeFeed", "true").load()
        .writeStream.format("memory").queryName("snapsrc_cow_tbl")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("copy-on-write") ||
      Option(e.getCause).exists(_.getMessage.contains("copy-on-write")),
      s"expected the loud COW refusal, got: ${e.getMessage}")
  }

  test("the scan reports manifest statistics — a small snapshot " +
      "auto-broadcasts") {
    import spark.implicits._
    val dir = "/tmp/graft-test/snapsource-stats"
    graft.Scratch.clear(dir)
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "tag")
      .write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    val dim = spark.read.format("graft-snapshot").option("path", dir).load()
    val fact = spark.range(0, 200000)
      .select(org.apache.spark.sql.functions.col("id"),
        (org.apache.spark.sql.functions.col("id") % 3 + 1).as("k"))
    // NO broadcast() hint: the join side choice must come from the
    // scan's reported sizeInBytes (a few KB, far under the threshold)
    val joined = fact.join(dim, "k")
    val plan = graft.Plans.formatted(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"small snapshot table did not auto-broadcast:\n${plan.take(1500)}")
    assert(joined.count() == 200000)
  }

  test("change-feed micro-batches decode COLUMNAR (file deltas and " +
      "U-split literals)") {
    val root = graft.Scratch.dirFor("snapsrc_colstream", sf)
    graft.Scratch.clear(root)
    val dir = s"$root/t"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    val base = mkBase()
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    val n = base.count()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", dir).option("changeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // the vectorized reader's raw-row counter is the witness: a
    // row-path decode would leave it untouched
    val before = SnapshotVectorized.rawRows.sum()
    drain()
    val decoded = SnapshotVectorized.rawRows.sum() - before
    assert(spark.read.parquet(out).count() == n)
    assert(decoded >= n,
      s"the change feed must decode its file deltas through the " +
        s"vectorized reader (counted $decoded of $n)")
    // a rewrite commit on a KEYED table streams a literal U-split
    // delta — served as an in-memory ColumnarBatch alongside the
    // columnar file partitions
    SnapshotLog.commitKeysChange(dir,
      Seq("l_orderkey", "l_linenumber", "m"))
    val src = base.filter(col("m").isin(2))
    val updates = src.filter(col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"),
        (col("qty") + 1000).as("new_qty"))
    SnapshotMerge(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"),
      deletes = updates.limit(0).select("l_orderkey", "l_linenumber",
        "m"),
      updates = updates, inserts = src.limit(0),
      Map("qty" -> "new_qty"))
    drain()
    val all = spark.read.parquet(out)
    val uRows = all.filter(col("_op") === "U")
    // per KEY, not per row: the synthetic (l_orderkey, l_linenumber)
    // is not unique, and the U-split folds per key
    assert(uRows.count() ==
      updates.select("l_orderkey", "l_linenumber").distinct().count(),
      "the rewrite's U-split must stream exactly the updated keys")
  }
}
