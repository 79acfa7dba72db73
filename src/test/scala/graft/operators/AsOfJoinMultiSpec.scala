package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AsOfJoin.backwardMulti]]: k as-of enrichments in one pass must be
  * value-identical to k chained [[AsOfJoin.backward]] calls and must
  * shuffle the left side once, not once per enrichment.
  */
class AsOfJoinMultiSpec extends SparkSpec {

  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10, "a"), (1L, 20, "b"), (1L, 30, "c"),
    (2L, 15, "d"), (2L, 25, "e"), (3L, 5, "f"))
    .toDF("id", "t", "tag")
  private lazy val ratings = Seq(
    (1L, 10, 7.0), (1L, 25, 8.0), (2L, 20, 3.0))
    .toDF("id", "r_t", "rating")
  private lazy val amounts = Seq(
    (1L, 5, 100.0), (1L, 30, 200.0), (3L, 1, 50.0))
    .toDF("id", "a_t", "amt")

  test("one-pass multi equals two chained backward joins") {
    val chained = AsOfJoin.backward(
      AsOfJoin.backward(left, ratings, Seq("id"), "t", "r_t", Seq("rating")),
      amounts, Seq("id"), "t", "a_t", Seq("amt"))
    val multi = AsOfJoin.backwardMulti(left, Seq("id"), "t", Seq(
      AsOfJoin.Right(ratings, "r_t", Seq("rating")),
      AsOfJoin.Right(amounts, "a_t", Seq("amt"))))
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf)
    assert(multi.collect().map(key).toSet == chained.collect().map(key).toSet)
    // spot-check the inclusive-backward semantics per payload
    val m = multi.collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(m((1L, 10)) == (Some(7.0), Some(100.0)))  // exact match + earlier
    assert(m((1L, 20)) == (Some(7.0), Some(100.0)))
    assert(m((1L, 30)) == (Some(8.0), Some(200.0)))
    assert(m((2L, 15)) == (None, None))              // rating only at 20
    assert(m((3L, 5)) == (None, Some(50.0)))
  }

  test("strict mode excludes exact-timestamp matches in every source") {
    val multi = AsOfJoin.backwardMulti(left, Seq("id"), "t", Seq(
      AsOfJoin.Right(ratings, "r_t", Seq("rating")),
      AsOfJoin.Right(amounts, "a_t", Seq("amt"))), strict = true)
    val m = multi.collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(m((1L, 10)) == (None, Some(100.0))) // rating@10 no longer matches
    assert(m((1L, 30)) == (Some(8.0), Some(100.0))) // amt@30 excluded
  }

  test("multi shuffles the left side once, chained once per enrichment") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      graft.Plans.planCounts(df).shuffles
    val chained = AsOfJoin.backward(
      AsOfJoin.backward(left, ratings, Seq("id"), "t", "r_t", Seq("rating")),
      amounts, Seq("id"), "t", "a_t", Seq("amt"))
    val multi = AsOfJoin.backwardMulti(left, Seq("id"), "t", Seq(
      AsOfJoin.Right(ratings, "r_t", Seq("rating")),
      AsOfJoin.Right(amounts, "a_t", Seq("amt"))))
    // one union-window exchange vs one per backward() call
    assert(exchanges(multi) == 1, s"multi: ${exchanges(multi)}")
    assert(exchanges(chained) == 2, s"chained: ${exchanges(chained)}")
  }
}
