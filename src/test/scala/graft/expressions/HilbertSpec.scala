package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HilbertIndex — the three facts that make it a layout key:
  *
  *  1. Bijection: d2 maps the 2^bits × 2^bits grid onto [0, 4^bits)
  *     exactly once (no aliasing — two rows never share a curve
  *     position unless they share the bucketed point).
  *  2. Adjacency: consecutive curve positions are Manhattan-distance-1
  *     neighbours — the property the Morton curve LACKS (its quadrant
  *     seams jump arbitrarily far), and the reason Hilbert file boxes
  *     are tighter.
  *  3. The SQL surface (`hilbertindex(x, y, bits)`) agrees with the
  *     static transform and throws on out-of-range points.
  */
class HilbertSpec extends SparkSpec {

  test("d2 is a bijection onto [0, 4^bits) and xy inverts it") {
    val bits = 5
    val n = 1 << bits
    val seen = new Array[Boolean](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertIndex.d2(x.toLong, y.toLong, bits)
      assert(d >= 0 && d < n * n, s"($x,$y) -> $d off-curve")
      assert(!seen(d.toInt), s"position $d hit twice")
      seen(d.toInt) = true
      assert(HilbertIndex.xy(d, bits) == (x.toLong, y.toLong),
        s"xy(d2($x,$y)) failed to round-trip")
    }
  }

  test("consecutive curve positions are Manhattan-distance-1 neighbours") {
    val bits = 5
    val n = 1 << bits
    var d = 0L
    while (d < n.toLong * n - 1) {
      val (x1, y1) = HilbertIndex.xy(d, bits)
      val (x2, y2) = HilbertIndex.xy(d + 1, bits)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between curve positions $d and ${d + 1}")
      d += 1
    }
  }

  test("SQL surface matches the static transform; out-of-range throws") {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    val rows = Seq((0L, 0L), (3L, 5L), (31L, 31L), (17L, 2L))
      .toDF("x", "y")
      .withColumn("d", call_function("hilbertindex",
        col("x"), col("y"), lit(5)))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("d") ==
        HilbertIndex.d2(r.getAs[Long]("x"), r.getAs[Long]("y"), 5))
    }
    val thrown = intercept[Exception] {
      Seq((32L, 0L)).toDF("x", "y")
        .withColumn("d", call_function("hilbertindex",
          col("x"), col("y"), lit(5)))
        .collect()
    }
    assert(thrown.getMessage != null)
  }
}
