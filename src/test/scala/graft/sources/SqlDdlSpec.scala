package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog

/** SQL DDL on the lake kernel: `CREATE TABLE … PARTITIONED BY` commits
  * an empty schema-carrying snapshot (create-by-write no longer the
  * only door), `INSERT INTO` labels every produced file by the spec
  * column (partition pruning / metadata COUNT work from birth), and
  * `ALTER TABLE RENAME COLUMN / ADD COLUMN / widen` are the S40
  * pure-metadata evolution — old versions keep their own schema,
  * pre-evolution files serve the new schema through the rename/widen/
  * null-fill reader, zero bytes rewritten. Unsupported changes (DROP
  * COLUMN, narrowing, NOT NULL adds, renaming the spec column) refuse
  * loudly.
  */
class SqlDdlSpec extends SparkSpec {

  private def fresh(tag: String): (String, String) = {
    val dir = s"/tmp/graft-test/sqlddl-$tag/t"
    graft.Scratch.clear(s"/tmp/graft-test/sqlddl-$tag")
    (dir, s"graft_lake.`$dir`")
  }

  test("CREATE + INSERT: empty table reads empty; inserts are labeled") {
    val (dir, tbl) = fresh("create")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, grp BIGINT, v DOUBLE) " +
      "PARTITIONED BY (grp)")
    assert(SnapshotLog.latest(dir) == 1)
    assert(spark.sql(s"SELECT * FROM $tbl").count() == 0L)
    spark.sql(s"INSERT INTO $tbl SELECT id, id % 3 AS grp, " +
      "id * 0.5 AS v FROM range(90)")
    // every produced file carries its partition label — pruning and
    // metadata COUNT work from the first insert
    val es = SnapshotLog.entries(dir, SnapshotLog.latest(dir))
      .filter(_.kind == "D")
    assert(es.nonEmpty)
    assert(es.forall(e => e.partition.matches("grp=\\d+")))
    assert(es.forall(_.rows > 0))
    assert(es.forall(_.bytes > 0))
    // a second INSERT appends (snapshot history, not overwrite)
    spark.sql(s"INSERT INTO $tbl VALUES (1000, 1, 2.5)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == 91L)
    // the grouped count is served from the manifest: delete the files
    SnapshotLog.entries(dir, SnapshotLog.latest(dir)).foreach(e =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))
    val byGrp = spark.sql(
      s"SELECT grp, count(*) AS n FROM $tbl GROUP BY grp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGrp == Map(0L -> 30L, 1L -> 31L, 2L -> 30L))
  }

  test("CREATE TABLE twice fails; unsupported partitioning refuses") {
    val (dir, tbl) = fresh("twice")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT)")
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE $tbl (id BIGINT)"))
    assert(e.getMessage.toLowerCase.contains("already exists"),
      s"got: ${e.getMessage}")
    val (_, tbl2) = fresh("bucketpart")
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $tbl2 (id BIGINT, g BIGINT, h BIGINT) " +
        "PARTITIONED BY (g, h)"))
    assert(e2.getMessage.contains("one identity column"))
  }

  test("ALTER TABLE RENAME/ADD/widen: metadata-only, old files serve") {
    val (dir, tbl) = fresh("alter")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, grp BIGINT, qty INT) " +
      "PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $tbl SELECT id, id % 2, CAST(id AS INT) " +
      "FROM range(10)")
    val vBefore = SnapshotLog.latest(dir)
    val dataBefore = SnapshotLog.entries(dir, vBefore)
      .map(e => e.path -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(e.path))).toMap

    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN qty TO quantity")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN note STRING")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN quantity TYPE BIGINT")

    // pure metadata: same files, same mtimes, three new snapshots
    val vAfter = SnapshotLog.latest(dir)
    assert(vAfter == vBefore + 3)
    val dataAfter = SnapshotLog.entries(dir, vAfter)
      .map(e => e.path -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(e.path))).toMap
    assert(dataAfter == dataBefore, "ALTER TABLE must rewrite nothing")

    // pre-evolution files serve the new schema: rename + widen + null
    val r = spark.sql(s"SELECT id, quantity, note FROM $tbl " +
      "WHERE id = 7").head
    assert(r.getLong(0) == 7L && r.getLong(1) == 7L && r.isNullAt(2))
    // inserts under the NEW schema round-trip
    spark.sql(s"INSERT INTO $tbl VALUES (100, 0, 5, 'x')")
    assert(spark.sql(s"SELECT note FROM $tbl WHERE id = 100")
      .head.getString(0) == "x")
    // time travel serves the OLD schema under its own version
    val old = spark.sql(s"SELECT * FROM $tbl VERSION AS OF $vBefore")
    assert(old.schema.fieldNames.toSeq == Seq("id", "grp", "qty"))
    assert(old.count() == 10L)
  }

  test("INSERT OVERWRITE replaces content as a snapshot; DROP removes") {
    val (dir, tbl) = fresh("overwrite")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, grp BIGINT) " +
      "PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $tbl SELECT id, id % 2 FROM range(50)")
    val vIns = SnapshotLog.latest(dir)
    spark.sql(s"INSERT OVERWRITE $tbl SELECT id, id % 2 FROM range(7)")
    // content replaced — but as a VERSION: time travel serves the
    // pre-overwrite table, nothing was wiped
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == 7L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $tbl VERSION AS OF $vIns")
      .head.getLong(0) == 50L)
    // overwrite files are spec-labeled like any insert
    val es = SnapshotLog.entries(dir, SnapshotLog.latest(dir))
      .filter(_.kind == "D")
    assert(es.forall(_.partition.matches("grp=\\d+")))

    // DROP TABLE removes it; IF EXISTS then no-ops; re-CREATE works
    spark.sql(s"DROP TABLE $tbl")
    assert(SnapshotLog.latest(dir) == 0)
    intercept[Exception](spark.sql(s"SELECT * FROM $tbl").collect())
    spark.sql(s"DROP TABLE IF EXISTS $tbl") // no throw
    spark.sql(s"CREATE TABLE $tbl (x BIGINT)")
    spark.sql(s"INSERT INTO $tbl VALUES (1)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head.getLong(0)
      == 1L)
  }

  test("unsupported ALTERs refuse loudly") {
    val (dir, tbl) = fresh("refuse")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, grp BIGINT, v DOUBLE) " +
      "PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 0, 1.0)")
    val drop = intercept[Exception](
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN v"))
    assert(drop.getMessage.contains("DROP COLUMN"))
    // the narrowing cast is refused before it can commit — by Spark's
    // own analyzer (NOT_SUPPORTED_CHANGE_COLUMN) with the catalog's
    // widening guard behind it for programmatic callers
    val narrow = intercept[Exception](
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE INT"))
    assert(narrow.getMessage.toLowerCase.contains("widening") ||
      narrow.getMessage.toLowerCase.contains("not_supported_change_column"))
    val spec = intercept[Exception](
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN grp TO g2"))
    assert(spec.getMessage.contains("partition"))
    // renaming ONTO an existing column would record a schema header
    // with duplicate field names — refused, not silently corrupted
    val collide = intercept[Exception](
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN id TO v"))
    assert(collide.getMessage.contains("already exists"),
      s"got: ${collide.getMessage}")
    // the failed ALTERs committed nothing
    assert(spark.sql(s"SELECT * FROM $tbl").columns.toSeq ==
      Seq("id", "grp", "v"))
  }
}
