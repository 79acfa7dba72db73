package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoinRewriteRule — the naive interval join must CHANGE PHYSICAL
  * SHAPE under the rule (nested-loop → equi join over exploded buckets)
  * while the result set stays bit-identical, including the hostile
  * corners: negative domains (truncating division stays monotonic) and
  * null bounds (sequence(null) explodes to nothing — inner-join
  * semantics).
  */
class RangeJoinRuleSpec extends SparkSpec {

  private val WidthConf = "spark.graft.rangejoin.bucketWidth"

  private def withWidth[A](w: String)(body: => A): A = {
    val prev = spark.conf.getOption(WidthConf)
    spark.conf.set(WidthConf, w)
    try body finally prev match {
      case Some(v) => spark.conf.set(WidthConf, v)
      case None => spark.conf.unset(WidthConf)
    }
  }

  private def naive(points: DataFrame, bands: DataFrame): DataFrame =
    points.join(bands, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("p"), col("band"))

  private def fixture(): (DataFrame, DataFrame) = {
    import spark.implicits._
    // negative and positive points; one band with a null lo (must match
    // nothing), bands overlapping zero and bucket boundaries
    val points = (-500L to 500L by 7L).toDF("p")
    val bands = Seq(
      (0L, Some(-450L), -100L), (1L, Some(-64L), 63L),
      (2L, Some(100L), 101L), (3L, None, 400L), (4L, Some(380L), 500L))
      .toDF("band", "lo", "hi")
    (points, bands)
  }

  test("rule off: nested loop; rule on: equi join over exploded buckets") {
    val (points, bands) = fixture()
    val off = withWidth("0")(
      naive(points, bands).queryExecution.executedPlan.toString)
    assert(off.contains("BroadcastNestedLoopJoin"),
      s"expected nested loop without the rule:\n$off")
    val on = withWidth("64")(
      naive(points, bands).queryExecution.executedPlan.toString)
    assert(!on.contains("BroadcastNestedLoopJoin"),
      s"rule left a nested loop in place:\n$on")
    assert(on.contains("Generate"), s"no bucket explode in plan:\n$on")
  }

  test("on == off, negatives and null bounds included") {
    val (points, bands) = fixture()
    val off = withWidth("0")(naive(points, bands).collect().toSet)
    val on = withWidth("64")(naive(points, bands).collect().toSet)
    assert(off.nonEmpty)
    assert(on == off, s"rewrite changed the answer: ${on.diff(off)} / ${off.diff(on)}")
    // the null-lo band matched nothing either way
    assert(!off.exists(_.getLong(1) == 3L))
  }

  test("LEFT OUTER with points preserved: fires, on == off incl. null-extension") {
    val (points, bands) = fixture()
    def outer() = points.join(bands,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
      .select(col("p"), col("band"))
    val offPlan = withWidth("0")(outer().queryExecution.executedPlan.toString)
    assert(offPlan.contains("BroadcastNestedLoopJoin"), offPlan)
    val onPlan = withWidth("64")(outer().queryExecution.executedPlan.toString)
    assert(!onPlan.contains("BroadcastNestedLoopJoin"),
      s"outer rewrite did not fire:\n$onPlan")
    assert(onPlan.contains("Generate"), onPlan)
    val off = withWidth("0")(outer().collect().toSet)
    val on = withWidth("64")(outer().collect().toSet)
    // unmatched points must null-extend EXACTLY once (a set compare
    // would hide duplicate null-extensions — compare as multisets)
    val offM = withWidth("0")(outer().collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap)
    val onM = withWidth("64")(outer().collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap)
    assert(off.exists(_.isNullAt(1)), "fixture must have unmatched points")
    assert(onM == offM, "outer rewrite changed the multiset")
    assert(on == off)
  }

  test("outer join preserving the INTERVAL side must not fire") {
    val (points, bands) = fixture()
    // bands LEFT OUTER points: the preserved side is the interval side —
    // exploding it would null-extend unmatched bands once per bucket
    def preservedIntervals() = bands.join(points,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
      .select(col("band"), col("p"))
    val onPlan = withWidth("64")(
      preservedIntervals().queryExecution.executedPlan.toString)
    assert(!onPlan.contains("Generate"),
      s"rule fired on an interval-preserving outer join:\n$onPlan")
    val off = withWidth("0")(preservedIntervals().collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue
        else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap)
    val on = withWidth("64")(preservedIntervals().collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue
        else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap)
    // the null-lo band appears exactly once, null-extended, both ways
    assert(off((3L, Long.MinValue)) == 1)
    assert(on == off)
  }

  test("idempotent: an equi conjunct already present leaves the join alone") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "p")
    val b = Seq((1L, 5L, 15L), (2L, 25L, 30L)).toDF("k2", "lo", "hi")
    val joined = a.join(b, col("k") === col("k2") &&
      col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = withWidth("64")(
      joined.queryExecution.executedPlan.toString)
    assert(!plan.contains("Generate"),
      s"rule fired on an already-hash-plannable join:\n$plan")
    val rows = withWidth("64")(joined.collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
  }
}
