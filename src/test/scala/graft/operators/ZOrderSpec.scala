package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The z-order layout must actually BUY pruning: matching rows of a
  * two-dimensional box predicate concentrate into fewer files than a
  * linear (single-key-sorted) layout scatters them into. Files-touched
  * is the honest proxy for footer min/max skipping — a file none of
  * whose rows match would be skipped by a min/max-pruning reader
  * whenever the box misses its (min,max) envelope, which is exactly
  * what clustering narrows.
  */
class ZOrderSpec extends SparkSpec {

  test("z-value interleaves bits exactly") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y"))).as("z"))
    // morton(x, y) with x in even bits, y in odd bits
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(3, 5), morton(65535, 65535)))
  }

  test("box predicate touches fewer files under z-order than linear sort") {
    val sf = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, sf)
    val box = col("l_partkey").between(50, 150) &&
      col("l_suppkey").between(5, 15)

    def filesTouched(written: String): Long =
      spark.read.parquet(written).filter(box)
        .select(input_file_name()).distinct().count()

    val dir = graft.Scratch.dirFor("zorder_spec", sf)
    li.withColumn("z",
        ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey"))))
      .repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .drop("z").write.mode("overwrite").parquet(s"$dir/zsorted")
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    val zFiles = filesTouched(s"$dir/zsorted")
    val linFiles = filesTouched(s"$dir/linear")
    val totalFiles = spark.read.parquet(s"$dir/zsorted")
      .select(input_file_name()).distinct().count()
    assert(zFiles > 0, "box must match rows")
    assert(zFiles < totalFiles,
      s"z-order must concentrate matches ($zFiles of $totalFiles files)")
    assert(zFiles < linFiles,
      s"z-order ($zFiles files) must beat the linear layout ($linFiles)")
  }
}
