package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite

/** The real JDK-only codecs behind the multimodal seam: the PPM parser
  * must survive header comments, the WAV parser must walk unknown
  * chunks, and both must REJECT malformed payloads (quarantine tier's
  * contract) rather than emit garbage rows.
  */
class CodecSpec extends AnyFunSuite {

  test("ppm: round-trips the synthesized payload, comment line included") {
    for (id <- Seq(0L, 1L, 3L, 7L, 12L)) { // ids with and without comments
      val d = Multimodal.ppmParse(id, Multimodal.ppmPayload(id))
      assert(d.width == 4 + (id % 5).toInt && d.height == 3 + (id % 4).toInt)
      assert(d.n_pixels == d.width.toLong * d.height)
      assert(d.mean_r >= 0 && d.mean_r <= 255)
    }
  }

  test("ppm: hand-built image with known means decodes exactly") {
    // 2x1 image, pixels (10,20,30) and (30,40,50) → means (20,30,40)
    val bytes = "P6\n# hand built\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 30, 40, 50)
    val d = Multimodal.ppmParse(9L, bytes)
    assert(d.width == 2 && d.height == 1 && d.n_pixels == 2)
    assert((d.mean_r, d.mean_g, d.mean_b) == ((20L, 30L, 40L)))
  }

  test("ppm: resize samples exactly the even-coordinate pixels") {
    // 3x3 image with pixel k carrying value (k, k+100, k+200 mod 256):
    // NN 2x downsample keeps (0,0),(2,0),(0,2),(2,2) → k ∈ {0,2,6,8}
    val px = (0 until 9).flatMap(k =>
      Seq(k.toByte, (k + 100).toByte, ((k + 200) % 256).toByte)).toArray
    val bytes = "P6\n3 3\n255\n".getBytes("US-ASCII") ++ px
    val r = Multimodal.ppmResize(5L, bytes)
    assert(r.out_w == 2 && r.out_h == 2 && r.n_pixels == 4)
    val kept = Seq(0, 2, 6, 8)
    assert(r.mean_r == kept.map(_.toLong).sum / 4)
    assert(r.mean_g == kept.map(k => (k + 100).toLong).sum / 4)
    assert(r.mean_b == kept.map(k => (k + 200).toLong % 256).sum / 4)
  }

  test("ppm: rejects wrong magic and truncated raster") {
    intercept[IllegalArgumentException] {
      Multimodal.ppmParse(1L, "P5\n2 1\n255\nxx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.ppmParse(1L,
        "P6\n4 4\n255\nxy".getBytes("US-ASCII")) // claims 48 raster bytes
    }
  }

  test("wav: round-trips the synthesized payload, unknown chunk included") {
    for (id <- Seq(0L, 1L, 2L, 6L, 33L)) { // ids with and without LIST chunk
      val d = Multimodal.wavParse(id, Multimodal.wavPayload(id))
      assert(d.sample_rate == 8000)
      assert(d.n_samples == 16 + (id % 17))
      assert(d.peak_abs <= 32768L)
      assert(d.mean_offset >= 0 && d.mean_offset < 65536)
    }
  }

  test("wav: hand-built file with known samples decodes exactly") {
    // samples 100 and -100 → mean_offset 32768, peak 100
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(44100) ++ le32(88200) ++ le16(2) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(4) ++ le16(100) ++ le16(-100 & 0xFFFF)
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val d = Multimodal.wavParse(5L, wav)
    assert(d.sample_rate == 44100 && d.n_samples == 2)
    assert(d.mean_offset == 32768L && d.peak_abs == 100L)
  }

  test("wav: rejects non-RIFF and stereo payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.wavParse(1L, "OGGSxxxxxxxxxxxx".getBytes("US-ASCII"))
    }
    // stereo: flip the channel count inside a valid synthesized payload
    val b = Multimodal.wavPayload(1L)
    // fmt chunk body starts at byte 20; channels at +2
    b(22) = 2
    intercept[IllegalArgumentException] { Multimodal.wavParse(1L, b) }
  }
}
