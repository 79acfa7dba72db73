package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The invariant the s16 oracle checks at one split point, as a
  * property over random event logs and arbitrary splits: merging any
  * suffix batch into the history built from the prefix equals the full
  * rebuild — run collapse is prefix-stable.
  */
class Scd2Spec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7042L + i)))

  // small domains force long runs, equal-ord ties, and single-event keys
  private val logGen: Gen[List[(Long, String, Long, Long)]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 5L)
        a <- Gen.oneOf("F", "O", "P")
        o <- Gen.chooseNum(1L, 8L)
      } yield (k, a, o)).map(_.zipWithIndex.map {
        case ((k, a, o), i) => (k, a, o, i.toLong) // tb = unique event id
      }))

  test("merge(build(prefix), suffix) == build(all) on random logs/splits") {
    import spark.implicits._
    samples(logGen, 8).zipWithIndex.foreach { case (log, i) =>
      val all = log.toDF("k", "a", "o", "tb")
      val full = Scd2.build(all, "k", "a", "o", "tb")
        .select("k", "a", "valid_from", "valid_to", "is_current")
      // split on the ORDER key (merge semantics require the batch to be
      // later events), at a point that varies per sample
      val cut = (i % 8) + 1L
      val base = Scd2.build(all.filter(col("o") < cut), "k", "a", "o", "tb")
      val merged = Scd2.merge(base, all.filter(col("o") >= cut),
          "k", "a", "o", "tb")
        .select("k", "a", "valid_from", "valid_to", "is_current")
      assert(full.exceptAll(merged).count() == 0 &&
        merged.exceptAll(full).count() == 0,
        s"sample $i cut $cut: merge != rebuild")
    }
  }
}
