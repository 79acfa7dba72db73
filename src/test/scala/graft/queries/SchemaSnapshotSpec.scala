package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution composed with the snapshot log (s40) — what the
  * composition must guarantee:
  *
  *  1. The evolution commit is PURE METADATA: every file entry carried
  *     forward verbatim, bytes untouched on disk.
  *  2. Time travel serves each version under ITS OWN schema — v1 reads
  *     `qty` INT exactly as written; post-evolution reads serve
  *     `quantity` BIGINT with old files lifted through the manifest's
  *     rename/widen mapping and post-evolution appends native.
  *  3. A column ADDED by evolution null-fills for pre-evolution files.
  *  4. Rename mappings COMPOSE across evolutions — a twice-renamed
  *     column still resolves from its original files.
  */
class SchemaSnapshotSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("metadata-only evolution; per-version schemas; composed renames") {
    val dir = s"${graft.Scratch.dirFor("s40_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    val v1 = SnapshotMerge.writeInitial(spark, base, dir, "m")
    val e1 = SnapshotLog.entries(dir, v1)
    val mtimes = e1.map(e =>
      e.path -> new java.io.File(e.path).lastModified()).toMap

    // rename + widen + ADD a column, as one metadata commit
    val canonical = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("quantity", LongType),
      StructField("m", IntegerType),
      StructField("note", StringType))) // added: null for old files
    val v2 = SnapshotLog.commitSchemaChange(dir, canonical,
      Map("qty" -> "quantity"))
    assert(v2 == 2)

    // 1. pure metadata: identical paths, untouched bytes
    val e2 = SnapshotLog.entries(dir, v2)
    assert(e2.map(_.path).sorted == e1.map(_.path).sorted,
      "a schema commit must not touch file entries")
    e1.foreach { e =>
      assert(new java.io.File(e.path).lastModified() == mtimes(e.path),
        s"schema commit touched ${e.path}")
    }

    // 2. per-version schemas
    val r1 = SnapshotLog.read(spark, dir, v1)
    assert(r1.schema.fieldNames.contains("qty") &&
      r1.schema("qty").dataType == IntegerType,
      "v1 must keep serving its own (pre-evolution) schema")
    val r2 = SnapshotLog.read(spark, dir, v2)
    assert(r2.schema.fieldNames.toSeq ==
      Seq("l_orderkey", "l_linenumber", "quantity", "m", "note"))
    assert(r2.schema("quantity").dataType == LongType)
    // same values through the lift
    assert(r2.agg(sum(col("quantity"))).head.getLong(0) ==
      r1.agg(sum(col("qty")).cast("long")).head.getLong(0))
    // 3. the added column null-fills for pre-evolution files
    assert(r2.filter(col("note").isNotNull).count() == 0)

    // 4. renames compose: quantity → amount in a second evolution;
    // files on disk still say "qty", and still resolve
    val canonical2 = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("amount", LongType),
      StructField("m", IntegerType),
      StructField("note", StringType)))
    val v3 = SnapshotLog.commitSchemaChange(dir, canonical2,
      Map("quantity" -> "amount"))
    assert(SnapshotLog.renamesOf(dir, v3) ==
      Map("qty" -> "amount", "quantity" -> "amount"),
      "rename mappings must compose across evolutions")
    val r3 = SnapshotLog.read(spark, dir, v3)
    assert(r3.agg(sum(col("amount"))).head.getLong(0) ==
      r1.agg(sum(col("qty")).cast("long")).head.getLong(0),
      "a twice-renamed column must still resolve from original files")

    // merge-on-read composes with the lift: vector keys use canonical
    // names only if written post-evolution; here delete via a raw-name
    // check that readMor under schema grouping still subtracts
    val keys = r3.filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("m"))
    val v4 = graft.operators.DeleteVectors.appendDeletes(spark, dir, keys)
    assert(SnapshotLog.readMor(spark, dir, v4)
      .filter(col("l_orderkey") % 19 === 0).count() == 0,
      "vectors must apply on top of the schema lift")
  }
}
