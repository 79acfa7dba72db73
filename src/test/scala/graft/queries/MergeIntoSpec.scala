package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.MergeInto
import org.apache.spark.sql.functions._

/** Partition-pruned MERGE (s30_merge_upsert) — the property that makes
  * it affordable at scale: partitions the CDC batch does not touch are
  * NEVER rewritten (same files, same bytes, same mtimes), while the
  * merged table still equals the logical three-way apply computed over
  * the whole relation.
  */
class MergeIntoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def listFiles(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified())))
      .toMap
  }

  test("untouched partitions keep their exact files; merged == logical merge") {
    val dir = s"${graft.Scratch.dirFor("s30_merge_spec", sf)}/t"
    graft.Scratch.clear(dir)
    val base = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").cast("int").as("qty"),
      month(to_date(col("l_shipdate"))).as("m"))
    base.write.partitionBy("m").mode("overwrite").parquet(dir)
    val before = listFiles(dir)

    val src = spark.read.parquet(dir).filter(col("m").isin(2, 3))
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
    val touched = MergeInto(spark, dir, "m",
      Seq("l_orderkey", "l_linenumber"), deletes, updates, inserts,
      Map("qty" -> "new_qty"))
    assert(touched.toSet == Set(2, 3))

    val after = listFiles(dir)
    val untouchedBefore = before.filter(!_._1.matches(".*/m=[23]/.*"))
    val untouchedAfter = after.filter(!_._1.matches(".*/m=[23]/.*"))
    assert(untouchedBefore.nonEmpty)
    assert(untouchedAfter == untouchedBefore,
      "an untouched partition was rewritten")
    assert(after.keySet.filter(_.matches(".*/m=[23]/.*")) !=
      before.keySet.filter(_.matches(".*/m=[23]/.*")),
      "touched partitions must carry new files")

    // logical merge over the whole relation
    val want = base
      .filter(!(col("m").isin(2, 3) && col("l_orderkey") % 19 === 0))
      .withColumn("qty",
        when(col("m").isin(2, 3) && col("l_orderkey") % 19 =!= 0 &&
            col("l_orderkey") % 13 === 0,
          (col("l_orderkey") % 47 + 1).cast("int"))
          .otherwise(col("qty")))
      .unionByName(base.filter(col("m").isin(2, 3) &&
          col("l_orderkey") % 19 =!= 0 && col("l_orderkey") % 13 =!= 0 &&
          col("l_orderkey") % 17 === 0)
        .select((col("l_orderkey") + 1000000L).as("l_orderkey"),
          col("l_linenumber"), col("qty"), col("m")))
    val got = spark.read.parquet(dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("m"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "pruned merge must equal the logical whole-relation merge")
  }

  test("multiple source rows with DIFFERENT values for one key raise") {
    import spark.implicits._
    val dir = s"${graft.Scratch.dirFor("s30_conflict_spec", sf)}/t"
    graft.Scratch.clear(dir)
    Seq((1L, 1, 10, 1), (2L, 1, 20, 1), (3L, 1, 30, 2))
      .toDF("k", "ln", "qty", "m")
      .write.partitionBy("m").mode("overwrite").parquet(dir)
    val empty = Seq.empty[(Long, Int, Int)].toDF("k", "ln", "m")
    val emptyIns = Seq.empty[(Long, Int, Int, Int)]
      .toDF("k", "ln", "qty", "m")
    // two U rows for key (1, 1) with CONFLICTING new values — the
    // Delta "multiple source rows matched" case; must raise, not
    // silently row-multiply the target
    val conflicting = Seq((1L, 1, 1, 77), (1L, 1, 1, 88))
      .toDF("k", "ln", "m", "new_qty")
    val e = intercept[Exception] {
      MergeInto(spark, dir, "m", Seq("k", "ln"),
        empty, conflicting, emptyIns, Map("qty" -> "new_qty"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("multiple source rows matched")),
      s"wrong error: ${messages(e).mkString(" | ")}")

    // identical duplicates (the cross-partition repeat case) still
    // collapse and merge cleanly
    val dup = Seq((1L, 1, 1, 77), (1L, 1, 1, 77))
      .toDF("k", "ln", "m", "new_qty")
    MergeInto(spark, dir, "m", Seq("k", "ln"),
      empty, dup, emptyIns, Map("qty" -> "new_qty"))
    val qty1 = spark.read.parquet(dir).filter(col("k") === 1)
      .select(col("qty")).head.getInt(0)
    assert(qty1 == 77)
  }

  test("a CDC batch deleting EVERY row of a partition clears it") {
    import spark.implicits._
    val dir = s"${graft.Scratch.dirFor("s30_wipe_spec", sf)}/t"
    graft.Scratch.clear(dir)
    Seq((1L, 1, 10, 1), (2L, 1, 20, 1), (3L, 1, 30, 2), (4L, 1, 40, 3))
      .toDF("k", "ln", "qty", "m")
      .write.partitionBy("m").mode("overwrite").parquet(dir)
    // delete BOTH rows of m=1 — the merged output holds no m=1 row, so
    // dynamic overwrite alone would leave the old files and the
    // deletes would silently resurface
    val deletes = Seq((1L, 1, 1), (2L, 1, 1)).toDF("k", "ln", "m")
    val emptyUpd = Seq.empty[(Long, Int, Int, Int)]
      .toDF("k", "ln", "m", "new_qty")
    val emptyIns = Seq.empty[(Long, Int, Int, Int)]
      .toDF("k", "ln", "qty", "m")
    val touched = MergeInto(spark, dir, "m", Seq("k", "ln"),
      deletes, emptyUpd, emptyIns, Map("qty" -> "new_qty"))
    assert(touched == Seq(1))
    val left = spark.read.parquet(dir)
      .select(col("k"), col("m")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(left == Set((3L, 2), (4L, 3)),
      s"wiped partition resurfaced: $left")
    assert(!new java.io.File(s"$dir/m=1").exists(),
      "m=1 directory should be cleared")
  }
}
