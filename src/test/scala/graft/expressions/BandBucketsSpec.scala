package graft.expressions

import graft.SparkSpec
import graft.llmdata.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native `bandbuckets` must emit byte-identical (id, band, bucket) rows
  * to the composed transform/sort_array/md5 lambda it replaced — the
  * bucket strings ARE the LSH index keys, so any divergence silently
  * re-buckets the whole corpus.
  */
class BandBucketsSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(19042L + i)))

  test("native banding equals the composed lambda on random signatures") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    val sigGen = Gen.listOfN(32, Gen.chooseNum(0L, 2147483646L))
    val profiles = samples(sigGen, 60).zipWithIndex
      .map { case (mh, i) => (i.toLong, mh) }.toDF("id", "mh")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val native = rows(Dedup.bandKeys(profiles, k = 32, bands = 4))
    val composed = rows(Dedup.bandKeysComposed(profiles, k = 32, bands = 4))
    assert(native == composed,
      s"banding diverges: ${native.diff(composed).take(3)}")
    assert(native.size == 60 * 4)
  }

  test("null and short signatures mirror the composed md5('') semantics") {
    graft.GraftExtensions.ensure(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("mh", ArrayType(LongType, containsNull = true))))
    // NOTE: signatures SHORTER than k are not comparable — under ANSI
    // mode the composed form throws invalidArrayIndexError on mh[i]
    // past the end, while the native path treats missing slots as
    // absent members (defensive; MinHashK always emits exactly k)
    val rows = java.util.Arrays.asList(
      Row(1L, null),                                        // NULL signature
      Row(3L, Seq[Any](5L, null, 9L) ++ (3 until 32).map(_.toLong)))
    val profiles = spark.createDataFrame(rows, schema)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val native = collect(Dedup.bandKeys(profiles, k = 32, bands = 4))
    val composed = collect(Dedup.bandKeysComposed(profiles, k = 32, bands = 4))
    assert(native == composed,
      s"null banding diverges: ${native.diff(composed)} / ${composed.diff(native)}")
    // the null-signature doc must STAY in the index (one shared bucket)
    assert(native.count(_._1 == 1L) == 4)
  }
}
