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

  test("out-of-budget dims are refused at runtime, not silently truncated") {
    import spark.implicits._
    // 2^16 exceeds the default 16-bit budget: truncation would alias it
    // onto z(0,0) and silently collapse clustering — must raise instead
    val e = intercept[Exception] {
      Seq((65536L, 1L)).toDF("x", "y")
        .select(ZOrder.zValue(Seq(col("x"), col("y"))).as("z"))
        .collect()
    }
    assert(e.getMessage.contains("bucket/normalize") ||
      Option(e.getCause).exists(_.getMessage.contains("bucket/normalize")))
    val neg = intercept[Exception] {
      Seq((-1L, 1L)).toDF("x", "y")
        .select(ZOrder.zValue(Seq(col("x"), col("y"))).as("z"))
        .collect()
    }
    assert(neg.getMessage.contains("zValue") ||
      Option(neg.getCause).exists(_.getMessage.contains("zValue")))
  }

  test("bucketed maps [lo,hi] order-preservingly onto the bit budget") {
    import spark.implicits._
    val got = Seq(0L, 1L, 499999L, 999999L).toDF("k")
      .select(ZOrder.bucketed("k", 0L, 999999L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L && got.last == 65535L,
      s"domain endpoints must hit bucket endpoints: $got")
    assert(got == got.sorted, s"bucketing must preserve order: $got")
    assert(got.forall(b => b >= 0 && b < 65536))
    // bucketed output always satisfies zValue's range guard
    Seq((123456789L, 42L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(
        ZOrder.bucketed("x", 0L, 200000000L),
        ZOrder.bucketed("y", 0L, 99L))).as("z"))
      .collect()
  }

  test("bucketed refuses domains whose span overflows Long") {
    // hi - lo + 1 wraps for domains wider than half the Long range; the
    // wrap used to slip past the emptiness require and alias buckets.
    val e = intercept[IllegalArgumentException] {
      ZOrder.bucketed("k", Long.MinValue, 1L)
    }
    assert(e.getMessage.contains("pre-scale"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.bucketed("k", Long.MinValue, Long.MaxValue)
    }
    assert(e2.getMessage.contains("pre-scale"), e2.getMessage)
    // the widest LEGAL domain still buckets: endpoints map to 0 / 65535
    import spark.implicits._
    val wide = Seq(-1L, Long.MaxValue - 2).toDF("k")
      .select(ZOrder.bucketed("k", -1L, Long.MaxValue - 2).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(wide == Seq(0L, 65535L), s"widest legal domain: $wide")
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

  test("footer zone maps on BOTH dims prune more under z-order than linear") {
    // the s21 composition measured where it counts: the PLANNER's view.
    // Survivors come from real parquet footer stats consulted on both
    // box dimensions conjunctively — under a linear (l_orderkey) layout
    // every file's (l_partkey, l_suppkey) ranges span the whole domain,
    // so zone maps keep ~everything; under z-order each file covers a
    // small box of the key plane and most footers rule themselves out.
    val sf = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, sf)
    val dir = graft.Scratch.dirFor("zorder_zm_spec", sf)
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).collect().head
    val z = ZOrder.zValue(Seq(
      ZOrder.bucketed("l_partkey", b.getLong(0), b.getLong(1)),
      ZOrder.bucketed("l_suppkey", b.getLong(2), b.getLong(3))))
    li.withColumn("zv", z).repartitionByRange(16, col("zv"))
      .sortWithinPartitions(col("zv")).drop("zv")
      .write.mode("overwrite").parquet(s"$dir/zz")
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/lin")

    val box = Seq(("l_partkey", 50L, 150L), ("l_suppkey", 5L, 15L))
    val zSurv = graft.queries.QFilters
      .zoneMapSurvivorsBox(spark, s"$dir/zz", box).size
    val linSurv = graft.queries.QFilters
      .zoneMapSurvivorsBox(spark, s"$dir/lin", box).size
    assert(zSurv > 0)
    assert(zSurv < linSurv,
      s"z-order survivors ($zSurv) must beat linear ($linSurv)")
    assert(zSurv < 16, s"z-order must skip some of the 16 files ($zSurv)")
    // correctness of pruning: the survivor scan returns exactly the
    // full-scan box answer
    val boxPred = col("l_partkey").between(50L, 150L) &&
      col("l_suppkey").between(5L, 15L)
    val full = spark.read.parquet(s"$dir/zz").filter(boxPred).count()
    val pruned = spark.read.parquet(graft.queries.QFilters
        .zoneMapSurvivorsBox(spark, s"$dir/zz", box): _*)
      .filter(boxPred).count()
    assert(pruned == full, s"pruning changed the answer: $pruned vs $full")
  }
}
