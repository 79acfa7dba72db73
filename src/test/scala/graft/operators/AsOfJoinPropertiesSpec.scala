package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the union+window as-of join: on random keyed event
  * streams (duplicate timestamps, keys missing from either side, null-free
  * payloads) [[AsOfJoin.backward]] must equal a driver-side brute-force
  * merge_asof — latest right row at-or-before (backward) / strictly-before
  * (strict), ties broken by the LAST row under the tie-break order.
  */
class AsOfJoinPropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7042L + i)))

  // small domains force key overlap, timestamp collisions and empty sides
  private val rowGen: Gen[(Long, Long, Long)] = for {
    k <- Gen.chooseNum(0L, 4L)   // by-key
    t <- Gen.chooseNum(0L, 20L)  // event time
    v <- Gen.chooseNum(0L, 99L)  // payload / tie-break
  } yield (k, t, v)

  private def reference(
      lefts: Seq[(Long, Long, Long)], rights: Seq[(Long, Long, Long)],
      strict: Boolean): Set[(Long, Long, Long, Option[Long])] =
    lefts.map { case (k, lt, lv) =>
      val matches = rights.filter { case (rk, rt, _) =>
        rk == k && (if (strict) rt < lt else rt <= lt)
      }
      // latest rt wins; among equal rt the LAST under (v) order wins
      val pick = matches.sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      (k, lt, lv, pick)
    }.toSet

  test("backward and strict as-of equal brute-force merge_asof on random streams") {
    import spark.implicits._
    for (round <- 0 until 3) {
      val lefts = samples(rowGen, 80).distinct
      val rights = samples(rowGen, 60).map { case (k, t, v) => (k, t, v + round) }
        .distinct
      val l = lefts.toDF("k", "lt", "lv")
      val r = rights.toDF("k", "rt", "rv")
      for (strict <- Seq(false, true)) {
        val got = AsOfJoin.backward(l, r, by = Seq("k"),
            leftOn = "lt", rightOn = "rt", payload = Seq("rv"),
            rightTieBreak = Seq("rv"), strict = strict)
          .select(col("k"), col("lt"), col("lv"), col("rv"))
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
            if (x.isNullAt(3)) None else Some(x.getLong(3))))
          .toSet
        val want = reference(lefts, rights, strict)
        assert(got == want,
          s"strict=$strict round=$round diff: ${got.diff(want)} vs ${want.diff(got)}")
      }
    }
  }

  test("tolerance gate nulls exactly the matches older than the bound") {
    import spark.implicits._
    for (round <- 0 until 3) {
      val lefts = samples(rowGen, 80).distinct
      val rights = samples(rowGen, 60).map { case (k, t, v) => (k, t, v + round) }
        .distinct
      val tol = 5L // micros, on the timestamp_micros(t) axis
      val l = lefts.toDF("k", "lt0", "lv")
        .withColumn("lt", timestamp_micros(col("lt0")))
      val r = rights.toDF("k", "rt0", "rv")
        .withColumn("rt", timestamp_micros(col("rt0")))
      val got = AsOfJoin.backwardTolerance(l, r, by = Seq("k"),
          leftOn = "lt", rightOn = "rt", payload = Seq("rv"),
          toleranceMicros = tol, rightTieBreak = Seq("rv"))
        .select(col("k"), col("lt0"), col("lv"), col("rv"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) None else Some(x.getLong(3))))
        .toSet
      // reference: the backward pick, then the staleness gate on ITS
      // timestamp — a stale match must NOT fall through to an older
      // (even staler) event
      val want = lefts.map { case (k, lt, lv) =>
        val matches = rights.filter { case (rk, rt, _) => rk == k && rt <= lt }
        val pick = matches.sortBy(x => (x._2, x._3)).lastOption
          .filter { case (_, rt, _) => lt - rt <= tol }.map(_._3)
        (k, lt, lv, pick)
      }.toSet
      assert(got == want,
        s"round=$round diff: ${got.diff(want)} vs ${want.diff(got)}")
    }
  }
}
