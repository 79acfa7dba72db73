package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Bloom prefilter's two load-bearing claims, each pinned where the
  * sf0.01 driver row can't discriminate (at oracle geometry the 2^20-bit
  * filter is so sparse it produces ~zero false positives, so the exact
  * tier's pruning never fires there):
  *
  *  1. NO FALSE NEGATIVES: every member gram survives the probe at any
  *     bitmap size — this is what makes the oracle (exact
  *     decontamination) a valid ground truth for dd_decontaminate_bloom.
  *  2. FALSE POSITIVES ARE PRUNED: with a deliberately tiny bitmap
  *     (256 bits for thousands of grams — nearly every probe collides)
  *     the exact tier still recovers exactly the broadcast-exact answer.
  */
class BloomDecontamSpec extends SparkSpec {

  private def randGrams(n: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => rnd.nextLong().abs % (1L << 60)).distinct.toDF("gh")
  }

  test("bloom probe never drops a member gram, even at degenerate sizes") {
    val members = randGrams(2000, seed = 7).cache()
    for (mBits <- Seq(256L, 4096L, 1048576L)) {
      val bloom = Dedup.bloomBitmap(members, mBits)
      val survived = Dedup.bloomProbe(members, bloom, mBits)
      assert(survived.count() == members.count(),
        s"mBits=$mBits dropped member grams — Bloom false negative")
    }
  }

  test("bitmaps past the hash-2 span are refused, not silently degraded") {
    // bloomPos2's affine mix reduces mod 2^31-1, so a filter wider than
    // 2^31 bits would leave the second probe addressing only a prefix —
    // an FPR degradation no caller would see. The constructor refuses.
    val g = randGrams(4, 7L)
    val e = intercept[IllegalArgumentException] {
      Dedup.bloomBitmap(g, (1L << 31) + 64L)
    }
    assert(e.getMessage.contains("2^31"))
    Dedup.bloomBitmap(g, 1L << 31).count() // the boundary itself is legal
  }

  test("tiny bitmap forces false positives; exact tier prunes them all") {
    import spark.implicits._
    val eval = randGrams(1500, seed = 11).cache()
    val corpus = randGrams(4000, seed = 13)
      .withColumn("id", (col("gh") % 97).as("id")).cache()
    val mBits = 256L
    val bloom = Dedup.bloomBitmap(eval, mBits)
    val probed = Dedup.bloomProbe(corpus, bloom, mBits)
    val trueHits = corpus.join(eval, Seq("gh"), "left_semi")
    // the tiny bitmap must actually be saturated enough to matter —
    // otherwise this test silently stops exercising the exact tier
    assert(probed.count() > trueHits.count() * 2,
      "expected heavy false positives from the 256-bit bitmap")
    val exactOfProbed = probed.join(eval, Seq("gh"), "left_semi")
      .select(col("id"), col("gh"))
    assert(exactOfProbed.exceptAll(trueHits.select(col("id"), col("gh"))).isEmpty &&
      trueHits.select(col("id"), col("gh")).exceptAll(exactOfProbed).isEmpty,
      "exact tier over Bloom survivors must equal direct exact semi-join")
  }
}
