package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual near-dup tier: dHash properties on the planted twin
  * fixture, and the banded candidate tier's zero-false-negative
  * guarantee against brute force — in both the fixture configuration
  * (7×8-bit bands, distance ≤ 6) and the corpus-scale configuration
  * (4×14-bit bands, distance ≤ 3).
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private val n = 400L // 100 twin families
  private lazy val sigs = Multimodal.dhashPpm(
    Multimodal.synthesizePayloads(
      spark.range(n).toDF("doc_id"), "doc_id",
      Multimodal.ppmTwinPayload).toDF(),
    "doc_id", "payload").cache()

  test("uniform brightness shift leaves the dHash unchanged") {
    // members 0..3 of a family differ by a +3·member uniform shift AND
    // a member-positioned bump; neutralize the bump by comparing two
    // hand-built payloads that differ ONLY in brightness
    def flat(shift: Int): Array[Byte] = {
      val head = "P6\n8 8\n255\n".getBytes("US-ASCII")
      val px = new Array[Byte](192)
      var i = 0
      while (i < 64) {
        val v = (i * 2 % 150) + shift
        px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte
        px(3 * i + 2) = v.toByte; i += 1
      }
      head ++ px
    }
    assert(Multimodal.ppmDHash(0, flat(0)) == Multimodal.ppmDHash(1, flat(40)))
  }

  test("twin families are near, strangers far — graded by doc_id") {
    val h = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    val famPairs = for {
      f <- 0L until n / 4; a <- 0 to 2; b <- (a + 1) to 3
    } yield (f * 4 + a, f * 4 + b)
    val famD = famPairs.map { case (a, b) => dist(a, b) }
    // construction bound: two member-positioned bumps touch at most a
    // few grid cells each
    assert(famD.max <= 10, s"family pair exceeded bound: ${famD.max}")
    // strangers: sample cross-family pairs — decorrelated patterns sit
    // near half the 56 bits apart
    val strangeD = (0L until n - 4).map(a => dist(a, a + 4))
    assert(strangeD.min > 10, s"stranger pair too close: ${strangeD.min}")
    // the detector at ≤6 therefore finds ONLY true twins here, and most
    // of them
    val caught = famD.count(_ <= 6)
    assert(caught * 10 >= famD.size * 6,
      s"twin recall too low: $caught of ${famD.size}")
  }

  test("banded candidates equal brute force — fixture and corpus configs") {
    def brute(maxDist: Int) = {
      val h = sigs.collect().map(r => r.getLong(0) -> r.getLong(1))
      (for {
        (a, ha) <- h; (b, hb) <- h if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
      } yield (a, b, d)).toSet
    }
    def banded(bands: Int, maxDist: Int) =
      Multimodal.hammingNearDups(sigs, "doc_id", "dhash",
          bits = 56, bands = bands, maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded(7, 6) == brute(6), "7x8 banding lost or invented pairs")
    assert(banded(4, 3) == brute(3), "4x14 banding lost or invented pairs")
  }

  test("guarantee precondition is enforced") {
    intercept[IllegalArgumentException] {
      Multimodal.hammingNearDups(sigs, "doc_id", "dhash",
        bits = 56, bands = 4, maxDist = 5) // 5 flips can hit all 4 bands
    }
    intercept[IllegalArgumentException] {
      Multimodal.hammingNearDups(sigs, "doc_id", "dhash",
        bits = 56, bands = 5, maxDist = 3) // 56 % 5 != 0
    }
  }
}
