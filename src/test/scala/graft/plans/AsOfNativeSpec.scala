package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The native as-of operator must (a) actually plan through the injected
  * strategy, (b) agree row-for-row with the composed union+window
  * formulation on both inclusive and strict semantics, and (c) keep the
  * composed form's exchange budget.
  */
class AsOfNativeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def left = Tables.events(spark, sf)
    .select(col("event_id").as("ord"), col("user_id").as("id"), col("ts"))

  private def right = graft.operators.Dedup.keepLast(
    Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("id"), col("ts").as("r_ts"),
        col("event_id").as("r_ord"),
        col("value").cast("decimal(18,2)").as("rating")),
    keys = Seq("id", "r_ts"), order = Seq(col("r_ord")))
    .select(col("id"), col("r_ts"), col("rating"))

  private def native(strict: Boolean) = AsOfJoin.backwardNative(
    left, right, Seq("id"), "ts", "r_ts", Seq("rating"), strict)

  private def composed(strict: Boolean) = AsOfJoin.backward(
    left, right, Seq("id"), "ts", "r_ts", Seq("rating"), Nil, strict)

  test("the injected strategy plans AsOfMergeJoinExec") {
    val plan = native(strict = false).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"),
      s"native as-of did not plan through the strategy:\n${plan.take(1200)}")
  }

  test("native == composed, inclusive and strict, nulls included") {
    for (strict <- Seq(false, true)) {
      val n = native(strict)
        .select(col("ord"), col("rating").cast("double"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      val c = composed(strict)
        .select(col("ord"), col("rating").cast("double"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(n.size == c.size && n == c,
        s"strict=$strict: native diverges from composed " +
          s"(first diffs: ${(n.toSet diff c.toSet).take(3)})")
      // rows before any event must surface a NULL payload
      assert(n.values.exists(_.isEmpty), "no null-payload rows — fixture weak")
      assert(n.values.exists(_.nonEmpty))
    }
  }

  test("FORWARD native == composed forward, inclusive and strict") {
    for (strict <- Seq(false, true)) {
      val n = AsOfJoin.forwardNative(
          left, right, Seq("id"), "ts", "r_ts", Seq("rating"), strict)
        .select(col("ord"), col("rating").cast("double"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      val c = AsOfJoin.forward(
          left, right, Seq("id"), "ts", "r_ts", Seq("rating"), Nil, strict)
        .select(col("ord"), col("rating").cast("double"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(n.size == c.size && n == c,
        s"strict=$strict: forward native diverges from composed " +
          s"(first diffs: ${(n.toSet diff c.toSet).take(3)})")
      // rows after the last event must surface a NULL payload
      assert(n.values.exists(_.isEmpty), "no null-payload rows — fixture weak")
      assert(n.values.exists(_.nonEmpty))
    }
  }

  test("forward: the resting right row is shared by later equal-window lefts") {
    // two left rows at the same time and one after the match — the
    // cursor must not consume the matched right row
    import spark.implicits._
    val lf = Seq((10L, 10L), (11L, 10L), (12L, 12L), (13L, 99L))
      .toDF("ord", "ts").withColumn("id", lit(1L))
    val r = Seq((1L, 15L, 7L)).toDF("id", "r_ts", "pay")
    val out = AsOfJoin.forwardNative(
        lf.select(col("ord"), col("id"), col("ts")), r,
        Seq("id"), "ts", "r_ts", Seq("pay"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(out == Map(
      10L -> Some(7L), 11L -> Some(7L), // both pre-window lefts match it
      12L -> Some(7L),                  // still before 15
      13L -> None),                     // past the last event
      s"forward sharing broken: $out")
  }

  test("non-nullable payloads surface NULL (not 0 / NPE) on unmatched rows") {
    // lit()-derived columns are NON-nullable in the analyzed schema; the
    // merge joins unmatched left rows to an all-null row, so the result
    // projection must bind against the nullable payload view — a
    // null-check-free BoundReference would silently read 0L for the
    // long and NPE for the string.
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("id", "ts")
    val r = Seq((1L, 15L)).toDF("id", "r_ts")
      .withColumn("pay_l", lit(7L))
      .withColumn("pay_s", lit("seven"))
    val out = AsOfJoin.backwardNative(
        l, r, Seq("id"), "ts", "r_ts", Seq("pay_l", "pay_s"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)), Option(x.get(3)))).toSet
    assert(out == Set(
      (1L, 10L, None, None),               // before the only right row
      (1L, 20L, Some(7L), Some("seven")),  // matched
      (2L, 5L, None, None)),               // key never on the right
      s"non-nullable payload mis-bound: $out")
  }

  test("native keeps the composed form's exchange budget") {
    // 3 = left keyed shuffle + right keyed shuffle + the right-side
    // dedup's (id, r_ts) window shuffle. The composed form counts 2
    // because left and right ride ONE union shuffle — of the WIDE
    // null-padded schema; the native form's extra exchange moves only
    // the narrow right relation, which is the trade the operator makes.
    val counts = graft.Plans.planCounts(native(strict = false))
    assert(counts.shuffles <= 3,
      s"native as-of shuffles: ${counts.shuffles}")
  }
}
