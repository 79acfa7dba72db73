package graft.llmdata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** mm_clip_neardup — the video tier's contracts:
  *
  *  1. The banded candidate tier equals brute force (pigeonhole: 7
  *     bands, maxDist 6 ⇒ no false negatives; exact verify kills the
  *     false positives).
  *  2. Temporal-hash invariance: a uniform brightness offset on every
  *     pixel leaves the signature bit-identical (the re-grade
  *     invariance the tier exists for).
  *  3. Every complete twin family is fully detected (all 6 member
  *     pairs within the Hamming threshold).
  *  4. Malformed containers reject loudly with the doc id.
  */
class ClipSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = {
    graft.GraftExtensions.ensure(spark)
    Tables.documents(spark, sf)
  }

  private def sigs = Multimodal.dhashClip(
    Multimodal.synthesizePayloads(docs, "doc_id", Multimodal.clipPayload)
      .toDF(),
    "doc_id", "payload")

  test("banded near-dup tier equals brute force on clip signatures") {
    val banded = Multimodal.hammingNearDups(sigs, "doc_id", "dhash",
      bits = 56, bands = 7, maxDist = 6)
    val s2 = sigs.select(col("doc_id").as("id_b"), col("dhash").as("h_b"))
    val brute = sigs.select(col("doc_id").as("id_a"), col("dhash").as("h_a"))
      .join(s2, col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= 6)
      .select(col("id_a"), col("id_b"), col("hamming"))
    assert(banded.exceptAll(brute).count() == 0 &&
      brute.exceptAll(banded).count() == 0,
      "banded pair set must equal brute force")
  }

  test("uniform brightness offset leaves the temporal hash bit-identical") {
    val base = Multimodal.clipPayload(42L)
    val brightened = base.clone()
    var p = 10
    while (p < brightened.length) {
      brightened(p) = ((brightened(p) & 0xFF) + 7).toByte
      p += 1
    }
    assert(Multimodal.clipTemporalDHash(42L, base) ==
      Multimodal.clipTemporalDHash(42L, brightened),
      "a re-graded clip must hash identically")
  }

  test("every complete twin family is fully detected") {
    val n = docs.agg(max(col("doc_id"))).collect().head.getLong(0) + 1
    val completeFams = (n / 4).toInt // families 4k..4k+3 fully present
    val pairs = Multimodal.hammingNearDups(sigs, "doc_id", "dhash",
      bits = 56, bands = 7, maxDist = 6)
      .filter(col("id_a") < completeFams * 4L &&
        expr("id_a div 4") === expr("id_b div 4"))
    assert(pairs.count() == completeFams * 6L,
      s"expected all 6 member pairs in each of $completeFams families")
  }

  test("malformed containers reject with the doc id") {
    val bad = "RIFFnope".getBytes("US-ASCII")
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.clipTemporalDHash(7L, bad)
    }
    assert(e1.getMessage.contains("doc 7"))
    val truncated = Multimodal.clipPayload(3L).take(100)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.clipTemporalDHash(3L, truncated)
    }
    assert(e2.getMessage.contains("truncated"))
  }
}
