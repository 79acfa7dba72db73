package graft.sources

import graft.SparkSpec
import graft.operators.{DeleteVectors, SnapshotLog, SnapshotMerge, SnapshotRefs}
import org.apache.spark.sql.functions._

/** SQL stored procedures (`CALL graft_lake.system.*`) — the kernel's
  * maintenance surface through the SQL door. Each test drives the
  * operator from PLAIN SQL TEXT and verifies the effect with the
  * kernel's own APIs:
  *
  *  - lifecycle: optimize (bin-pack) → create_tag → rollback →
  *    expire_snapshots → remove_orphans on one table;
  *  - compact folds a live vector; the pre-compact snapshot still
  *    time-travels;
  *  - refs: create_branch / fast_forward drive write-audit-publish;
  *  - set_keys unlocks the streaming U-split contract (header check);
  *  - clone + metadata procedures (snapshots / files) return
  *    manifest-backed rows;
  *  - an unknown procedure fails loudly, listing what exists.
  */
class ProcedureSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    import spark.implicits._
    val dir = s"/tmp/graft-test/proc-$tag"
    graft.Scratch.clear(dir)
    val df = (1 to 300).map(i => (i.toLong, (i % 7).toLong, i % 5))
      .toDF("k", "v", "m")
    SnapshotMerge.writeInitial(spark, df, dir, "m")
    dir
  }

  private def call(sql: String) = spark.sql(sql).collect()

  test("optimize → tag → rollback → expire → remove_orphans lifecycle") {
    val dir = freshTable("life")
    // fragment: three more tiny appends per partition
    import spark.implicits._
    (1 to 3).foreach { j =>
      SnapshotMerge.appendPartitioned(spark,
        Seq((1000L + j, j.toLong, j % 5)).toDF("k", "v", "m"), dir, "m")
    }
    val v0 = SnapshotLog.latest(dir)
    val opt = call(s"CALL graft_lake.system.optimize('$dir', 'm', 1048576)")
    assert(opt.head.getInt(0) == v0 + 1, "optimize must commit one snapshot")
    val content = SnapshotLog.read(spark, dir, v0 + 1)
    assert(content.count() == 303, "bin-pack must preserve content")

    val tag = call(s"CALL graft_lake.system.create_tag('$dir', 'rel-1')")
    assert(tag.head.getString(0) == "rel-1" && tag.head.getInt(1) == v0 + 1)
    assert(SnapshotRefs.resolveTag(dir, "rel-1") == v0 + 1)

    val rb = call(s"CALL graft_lake.system.rollback('$dir', 1)")
    assert(rb.head.getInt(1) == v0 + 2)
    assert(SnapshotLog.read(spark, dir, v0 + 2).count() == 300,
      "rollback must restore v1's content")

    // expire everything below the optimize; tagged + later survive
    val exp = call(
      s"CALL graft_lake.system.expire_snapshots('$dir', ${v0 + 1})")
    assert(exp.head.getInt(0) >= 0)
    assert(!SnapshotLog.committed(dir, 1) &&
      SnapshotLog.committed(dir, v0 + 1))

    // a dead writer-unique dir survives the aged sweep, dies at 0h
    val stray = s"$dir/data/stray/w-deadbeef"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stray))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$stray/f.parquet"), Array[Byte](1, 2, 3))
    assert(call(s"CALL graft_lake.system.remove_orphans('$dir')")
      .head.getInt(0) == 0, "fresh files must survive the aged sweep")
    assert(call(s"CALL graft_lake.system.remove_orphans('$dir', 0)")
      .head.getInt(0) == 1, "cutoff 0 must sweep the stray file")
  }

  test("compact folds a live vector; older snapshot keeps its view") {
    import spark.implicits._
    val dir = freshTable("compact")
    DeleteVectors.appendDeletes(spark, dir,
      Seq((2L, 2L % 7, 2), (4L, 4L % 7, 4)).toDF("k", "v", "m"))
    val vVec = SnapshotLog.latest(dir)
    val nVec = SnapshotLog.readMor(spark, dir, vVec).count()
    val cp = call(s"CALL graft_lake.system.compact('$dir', 'm')")
    val vC = cp.head.getInt(0)
    assert(SnapshotLog.entries(dir, vC).forall(_.kind == "D"),
      "compact must fold every vector")
    assert(SnapshotLog.read(spark, dir, vC).count() == nVec)
    assert(SnapshotLog.readMor(spark, dir, vVec).count() == nVec,
      "time travel to the vectored snapshot must still merge-on-read")
  }

  test("create_branch + fast_forward drive write-audit-publish") {
    import spark.implicits._
    val dir = freshTable("wap")
    call(s"CALL graft_lake.system.create_branch('$dir', 'audit')")
    Seq((9999L, 0L, 0)).toDF("k", "v", "m")
      .write.format("graft-snapshot").option("path", dir)
      .option("branch", "audit").mode("append").save()
    val staged = SnapshotRefs.head(dir, "audit")
    // staged commit invisible to the unpinned SQL read
    graft.GraftExtensions.ensure(spark)
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$dir`")
      .head.getLong(0) == 300, "staged commit leaked to main readers")
    if (!SnapshotRefs.branchExists(dir, "main"))
      SnapshotRefs.createBranch(dir, "main", 1)
    call(s"CALL graft_lake.system.fast_forward('$dir', 'main', $staged)")
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$dir`")
      .head.getLong(0) == 301, "published commit must serve")
  }

  test("set_keys declares the U-split contract; clone + metadata tables") {
    val dir = freshTable("meta")
    call(s"CALL graft_lake.system.set_keys('$dir', 'k, m')")
    assert(SnapshotLog.keysOf(dir, SnapshotLog.latest(dir))
      .contains(Seq("k", "m")))

    val dst = "/tmp/graft-test/proc-meta-clone"
    graft.Scratch.clear(dst)
    val cl = call(s"CALL graft_lake.system.clone('$dir', '$dst')")
    assert(cl.head.getInt(0) >= 1)
    assert(SnapshotLog.read(spark, dst, SnapshotLog.latest(dst))
      .count() == 300)

    val snaps = spark.sql(s"CALL graft_lake.system.snapshots('$dir')")
    assert(snaps.columns.toSeq ==
      Seq("version", "ts", "parent", "spec", "n_data", "n_eqdel",
        "n_posdel", "n_partitions"))
    assert(snaps.count() == SnapshotLog.latest(dir).toLong)
    val files = spark.sql(s"CALL graft_lake.system.files('$dir')")
    assert(files.filter(col("kind") === "D").count() ==
      SnapshotLog.files(dir, SnapshotLog.latest(dir)).size.toLong)
    // per-file recorded row counts sum to the table (writeInitial
    // collects task-side stats)
    val nRows = files.filter(col("kind") === "D")
      .agg(sum(col("n_rows"))).head.getLong(0)
    assert(nRows == 300L || nRows < 0L) // <0 only if stats-free writer
  }

  test("CALL optimize_zorder with within_part_col keeps labels") {
    val dir = freshTable("zwithin")
    val r = call(s"CALL graft_lake.system.optimize_zorder(" +
      s"'$dir', 'k,v', 4, 'm')")
    val v2 = r.head.getInt(0)
    assert(SnapshotLog.entries(dir, v2)
      .forall(_.partition.startsWith("m=")),
      "within_part_col ZORDER must keep partition labels")
    assert(SnapshotLog.read(spark, dir, v2).count() == 300)
  }

  test("SHOW PROCEDURES enumerates the system namespace") {
    val rows = spark.sql("SHOW PROCEDURES IN graft_lake.system").collect()
    val names = rows.map(_.getString(rows.head.schema.fieldIndex(
      "procedure_name"))).toSet
    assert(Set("expire_snapshots", "optimize", "rollback", "compact",
      "create_branch", "snapshots").subsetOf(names),
      s"SHOW PROCEDURES missing entries: $names")
  }

  test("DESCRIBE PROCEDURE surfaces the registered description") {
    val out = spark.sql(
      "DESC PROCEDURE graft_lake.system.expire_snapshots").collect()
      .map(_.toString).mkString(" ")
    assert(out.contains("expire_snapshots"),
      s"DESCRIBE PROCEDURE output unexpected: $out")
  }

  test("an unknown procedure fails loudly, naming the surface") {
    val e = intercept[Exception] {
      spark.sql("CALL graft_lake.system.frobnicate('/tmp/x')").collect()
    }
    // Spark wraps the catalog's error as FAILED_TO_LOAD_ROUTINE; the
    // loud enumeration rides in the cause chain
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val msgs = chain(e).mkString(" | ")
    assert(msgs.contains("FAILED_TO_LOAD_ROUTINE") &&
      (msgs.contains("frobnicate")),
      s"got: $msgs")
    assert(chain(e).exists(m => m.contains("unknown graft_lake procedure")
      && m.contains("expire_snapshots")),
      s"the catalog's enumeration must survive in the cause chain: $msgs")
  }
}
