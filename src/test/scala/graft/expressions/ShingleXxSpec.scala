package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native `shinglexx60` must emit the same hash ARRAY as the composed
  * `transform(sequence(1, greatest(len-(n-1),1)), i ->
  * xxhash64(substr(t,i,n)) & mask)` it replaced in the xxhash64 dedup
  * profile — including substr clipping on short texts and multi-byte
  * character boundaries.
  */
class ShingleXxSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(17042L + i)))

  // includes 2-, 3- and 4-byte UTF-8 characters to exercise the
  // byte-boundary scan
  private val alphabet =
    Gen.oneOf(('a' to 'f') ++ Seq(' ', 'ß', 'Ł', '日', '本', '\uD83D'))
  private val strGen: Gen[String] = Gen.chooseNum(0, 40)
    .flatMap(m => Gen.listOfN(m, alphabet).map(_.mkString))
    // a lone surrogate is not valid — pair it or drop it
    .map(_.replace("\uD83D", "😀"))

  test("native xx shingles equal the composed substr/xxhash64 form") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    for (n <- Seq(1, 3, 5)) {
      val composed = transform(
        sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1))),
        i => xxhash64(col("t").substr(i, lit(n)))
          .bitwiseAND(lit((1L << 60) - 1)))
      val diff = samples(strGen, 250).toDF("t")
        .select(call_function("shinglexx60", col("t"), lit(n)).as("native"),
          composed.as("ref"))
        .filter(col("native") =!= col("ref"))
        .collect()
      assert(diff.isEmpty,
        s"n=$n shinglexx60 diverges: ${diff.take(3).toSeq}")
    }
  }
}
