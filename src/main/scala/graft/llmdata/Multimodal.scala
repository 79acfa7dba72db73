package graft.llmdata

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in batched partition
  * passes — the Spark-side schema/partitioning/batch shape is real; the
  * codec itself is a clearly-marked deterministic STUB (no image/audio
  * libraries in this environment; swap `fakeDecode` for a real decoder
  * bound in `mapPartitions`, which is exactly where a JNI/FFI codec would
  * sit so the library loads once per partition, not once per row).
  */
object Multimodal {

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class Decoded(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      header_hex: String)

  /** STUB decode: derives deterministic pseudo-metadata from the bytes.
    * A real implementation would parse the container header / run the
    * codec here — per-partition, against the same batched iterator.
    */
  private def fakeDecode(b: Blob): Decoded = {
    val n = b.payload.length
    val header = b.payload.take(8).map(x => f"${x & 0xFF}%02X").mkString
    Decoded(b.doc_id, n, n % 640, n % 480, header)
  }

  /** binary ingestion + batched "decode": one partition-local pass, no
    * shuffle; the payload column never leaves the executor.
    */
  def decodeBlobs(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(fakeDecode))
      .toDF()
  }

  final case class Feature(doc_id: Long, bucket: Int, mean_code: Long)

  /** STUB feature-extract / "resize": the payload bytes (a 1-D signal
    * standing in for decoded pixels/samples) are downsampled into
    * `buckets` equal strides, each reduced to its integer mean — the
    * resize-to-fixed-width shape of an image/audio featurizer, run
    * partition-local with the same batched-iterator placement a real
    * library would use. Integer div keeps the mean exact (oracle-safe).
    */
  def featureBuckets(
      docs: DataFrame, idCol: String, binCol: String, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.flatMap { b =>
        val n = b.payload.length
        if (n == 0) Iterator.empty
        else {
          val sums = new Array[Long](buckets)
          val counts = new Array[Long](buckets)
          var i = 0
          while (i < n) {
            val bk = (i.toLong * buckets / n).toInt
            sums(bk) += (b.payload(i) & 0xFF)
            counts(bk) += 1
            i += 1
          }
          (0 until buckets).iterator.filter(counts(_) > 0)
            .map(bk => Feature(b.doc_id, bk, sums(bk) / counts(bk)))
        }
      })
      .toDF()
  }

  // ---- REAL codecs (JDK-only) behind the same mapPartitions seam ----
  //
  // The stub paths above prove the payload plumbing; these two decode
  // actual container formats — binary PPM (P6) images and RIFF/WAVE PCM
  // audio — byte-for-byte, inside the same partition-local iterator a
  // JNI/FFI codec would use. Payloads are synthesized deterministically
  // (no media files ship in this container), but the DECODERS are real
  // parsers: the PPM path must skip comment lines to find its pixels,
  // the WAV path must walk the chunk list past unknown chunks to find
  // `data`, so a fixed-offset slice cannot pass the oracle.

  /** Deterministic binary-PPM (P6) payload for a doc id: real container
    * bytes — magic, whitespace-separated header (with a `#` comment line
    * on every third doc, so decoding requires real header parsing),
    * maxval 255, packed RGB samples. Pixel byte i of doc d is
    * (d·31 + i·7) mod 256 — closed-form, so the oracle can re-derive
    * every byte without materializing blobs.
    */
  def ppmPayload(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 5).toInt
    val h = 3 + (docId % 4).toInt
    val header = new StringBuilder("P6\n")
    if (docId % 3 == 0) header.append(s"# synthetic c$docId\n")
    header.append(s"$w $h\n255\n")
    val hb = header.toString.getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      px(i) = ((docId * 31 + i.toLong * 7) % 256).toByte
      i += 1
    }
    hb ++ px
  }

  final case class PpmDecoded(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      mean_r: Long,
      mean_g: Long,
      mean_b: Long)

  /** Parse one P6 PPM byte array: magic check, whitespace/comment-aware
    * header scan, per-channel integer pixel means. Throws on malformed
    * input — corrupt routing belongs to the caller's quarantine tier,
    * not silent nulls.
    */
  /** Header scan shared by decode and resize: magic check, whitespace/
    * comment-aware ints, returns (width, height, raster offset) with the
    * raster length validated.
    */
  private def ppmHeader(id: Long, b: Array[Byte]): (Int, Int, Int) = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', s"doc $id: not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      var scanning = true
      while (scanning) {
        while (pos < b.length && (b(pos) == ' ' || b(pos) == '\n'
            || b(pos) == '\r' || b(pos) == '\t')) pos += 1
        if (pos < b.length && b(pos) == '#')
          while (pos < b.length && b(pos) != '\n') pos += 1
        else scanning = false
      }
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"doc $id: malformed PPM header at byte $pos")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(maxv == 255, s"doc $id: unsupported maxval $maxv")
    pos += 1 // exactly one whitespace byte separates maxval from raster
    require(b.length >= pos + 3 * w * h, s"doc $id: truncated raster")
    (w, h, pos)
  }

  private[llmdata] def ppmParse(id: Long, b: Array[Byte]): PpmDecoded = {
    val (w, h, pos) = ppmHeader(id, b)
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var k = 0
    while (k < n) {
      sr += b(pos + 3 * k) & 0xFF
      sg += b(pos + 3 * k + 1) & 0xFF
      sb += b(pos + 3 * k + 2) & 0xFF
      k += 1
    }
    PpmDecoded(id, w, h, n, sr / n, sg / n, sb / n)
  }

  final case class PpmResized(
      doc_id: Long,
      out_w: Int,
      out_h: Int,
      n_pixels: Long,
      mean_r: Long,
      mean_g: Long,
      mean_b: Long)

  /** Nearest-neighbor 2× downsample fused with the decode — the
    * feature-extraction resize step of an image-curation pipeline, kept
    * partition-local like every payload op. Output pixel (x, y) samples
    * source pixel (2x, 2y); odd dimensions round UP ((w+1)/2) so edge
    * pixels survive.
    */
  private[llmdata] def ppmResize(id: Long, b: Array[Byte]): PpmResized = {
    val (w, h, pos) = ppmHeader(id, b)
    val rw = (w + 1) / 2; val rh = (h + 1) / 2
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        val k = (2 * y) * w + (2 * x)
        sr += b(pos + 3 * k) & 0xFF
        sg += b(pos + 3 * k + 1) & 0xFF
        sb += b(pos + 3 * k + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    val n = rw.toLong * rh
    PpmResized(id, rw, rh, n, sr / n, sg / n, sb / n)
  }

  /** Decode a binary column of P6 PPM payloads — partition-local, the
    * payload never shuffles.
    */
  def decodePpm(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b => ppmParse(b.doc_id, b.payload)))
      .toDF()
  }

  /** Decode + nearest-neighbor 2× downsample in ONE partition-local
    * pass — the payload never shuffles, and no intermediate full-size
    * raster is materialized as a row.
    */
  def resizePpm(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b => ppmResize(b.doc_id, b.payload)))
      .toDF()
  }

  /** Deterministic RIFF/WAVE payload for a doc id: real chunked
    * container — RIFF header, `fmt ` chunk (PCM, mono, 16-bit, 8 kHz),
    * an unknown `LIST` chunk on every third doc (decoders must WALK the
    * chunk list, not slice fixed offsets), then `data` with little-endian
    * int16 samples. Sample k of doc d is ((d·131 + k·17) mod 65536) −
    * 32768 — closed-form for the oracle.
    */
  def wavPayload(docId: Long): Array[Byte] = {
    val nSamples = 16 + (docId % 17).toInt
    val samples = Array.tabulate(nSamples)(k =>
      (((docId * 131 + k.toLong * 17) % 65536) - 32768).toInt)
    buildWavContainer(docId, samples)
  }

  /** shared RIFF/WAVE container assembly (PCM mono 16-bit 8 kHz; LIST
    * chunk every third doc) — used by both synthetic payload families.
    */
  private def buildWavContainer(docId: Long, samples: Array[Int]): Array[Byte] = {
    val sampleRate = 8000
    val dataLen = samples.length * 2
    val junk = if (docId % 3 == 0) s"INFOc$docId".getBytes("US-ASCII") else Array.empty[Byte]
    val junkChunk =
      if (junk.isEmpty) Array.empty[Byte]
      else "LIST".getBytes("US-ASCII") ++ le32(junk.length) ++ junk ++
        (if (junk.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2) ++
      le16(2) ++ le16(16)
    val data = new Array[Byte](dataLen)
    var k = 0
    while (k < samples.length) {
      val v = samples(k)
      data(2 * k) = (v & 0xFF).toByte
      data(2 * k + 1) = ((v >> 8) & 0xFF).toByte
      k += 1
    }
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(dataLen) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ junkChunk ++ dataChunk
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Deterministic TWIN-FAMILY WAV payload — the audio analogue of
    * [[ppmTwinPayload]]: docs `4k..4k+3` share one 228-sample base
    * waveform (same scrambled product-of-linear-hashes closed form —
    * zero stranger pairs under the Hamming threshold at 10⁴ families);
    * member `m` plays it at amplitude `m+1` (a pure gain change — frame
    * energies scale by `(m+1)²`, flipping NO envelope comparison) and
    * adds `+500` to the samples of ONE member-positioned 4-sample frame,
    * which flips only the envelope-hash bits adjacent to that frame.
    * Amplitudes stay inside int16 (|base| ≤ 1000, +500, ×4 ⇒ ≤ 6000).
    */
  def wavTwinPayload(docId: Long): Array[Byte] = {
    val fam = docId / 4
    val mem = (docId % 4).toInt
    val bumpFrame = ((fam + mem * 29) % 57).toInt
    val samples = Array.tabulate(228) { k =>
      val a = (fam * 7919 + k + 1) % 65536
      val b = (fam * 104729 + k.toLong * 7919 + 12345) % 65536
      val base = ((a * b) % 2000 - 1000).toInt
      (base + (if (k / 4 == bumpFrame) 500 else 0)) * (mem + 1)
    }
    buildWavContainer(docId, samples)
  }

  /** 56-bit dHash over the short-time ENERGY ENVELOPE of a WAV payload:
    * 57 frames of `frameLen` samples, bit `f` set when frame `f+1` holds
    * more energy than frame `f`. Gain-invariant (a volume change scales
    * every energy by the same factor — no comparison flips), which is
    * the property that makes it a perceptual metric for audio; computed
    * in the same partition-local pass that chunk-walks the container.
    * Truncates to the first 228·`frameLen`/4… — callers supply payloads
    * with ≥ 58·frameLen samples; fewer frames simply leave high bits 0.
    */
  private[llmdata] def wavEnvelopeDHash(id: Long, b: Array[Byte],
      frameLen: Int): Long = {
    val (_, s) = wavSamples(id, b)
    val nFrames = math.min(57, s.length / frameLen)
    val e = new Array[Long](math.max(nFrames, 0))
    var f = 0
    while (f < nFrames) {
      var acc = 0L
      var k = f * frameLen
      val end = k + frameLen
      while (k < end) { acc += s(k).toLong * s(k); k += 1 }
      e(f) = acc
      f += 1
    }
    var hash = 0L
    var i = 0
    while (i < nFrames - 1) {
      if (e(i + 1) > e(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** envelope-dHash a binary column of WAV payloads — decode and hash
    * fused partition-locally; only (doc_id, 8-byte hash) shuffles.
    */
  def dhashWav(docs: DataFrame, idCol: String, binCol: String,
      frameLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b =>
        PpmHash(b.doc_id, wavEnvelopeDHash(b.doc_id, b.payload, frameLen))))
      .toDF()
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def rdLe16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def rdLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)

  final case class WavDecoded(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Long,
      mean_offset: Long, // integer mean of (sample + 32768) — stays >= 0
      peak_abs: Long)    // max |sample|

  /** Parse one RIFF/WAVE byte array: chunk-list walk (skipping unknown
    * chunks with odd-size padding), PCM16 mono verification, integer
    * sample stats. mean is over the +32768-offset samples so both
    * engines' integer division agrees without negative-rounding traps.
    */
  private[llmdata] def wavParse(id: Long, b: Array[Byte]): WavDecoded = {
    require(b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF"
        && new String(b, 8, 4, "US-ASCII") == "WAVE", s"doc $id: not RIFF/WAVE")
    var pos = 12
    var sampleRate = -1
    var samples: Array[Byte] = null
    var dataLen = 0
    while (pos + 8 <= b.length) {
      val cid = new String(b, pos, 4, "US-ASCII")
      val sz = rdLe32(b, pos + 4)
      val body = pos + 8
      cid match {
        case "fmt " =>
          require(rdLe16(b, body) == 1, s"doc $id: not PCM")
          require(rdLe16(b, body + 2) == 1, s"doc $id: not mono")
          sampleRate = rdLe32(b, body + 4)
          require(rdLe16(b, body + 14) == 16, s"doc $id: not 16-bit")
        case "data" =>
          require(body + sz <= b.length, s"doc $id: truncated data chunk")
          dataLen = sz
          samples = java.util.Arrays.copyOfRange(b, body, body + sz)
        case _ => () // unknown chunk — skip
      }
      pos = body + sz + (sz % 2) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, s"doc $id: missing fmt/data")
    val n = dataLen / 2
    var sum = 0L; var peak = 0L
    var k = 0
    while (k < n) {
      val v = (rdLe16(samples, 2 * k) << 16) >> 16 // sign-extend int16
      sum += v + 32768L
      val a = math.abs(v.toLong)
      if (a > peak) peak = a
      k += 1
    }
    WavDecoded(id, sampleRate, n, if (n == 0) 0L else sum / n, peak)
  }

  final case class WavFrame(
      doc_id: Long,
      frame_idx: Int,
      n_in_frame: Int,
      energy: Long,   // Σ s² over the frame (≤ 32768²·frameLen — fits long)
      peak_abs: Long)

  /** Decode + FRAME-FEATURE extraction fused in one partition-local
    * pass: the per-frame short-time energy / peak profile every audio
    * quality filter consumes (silence trimming, clipping detection),
    * computed straight off the chunk-walked PCM16 samples without the
    * sample array ever shuffling. One row per `frameLen`-sample frame;
    * the trailing partial frame is emitted with its true `n_in_frame`.
    */
  def decodeWavFrames(docs: DataFrame, idCol: String, binCol: String,
      frameLen: Int = 8): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.flatMap { b =>
        val (_, samples) = wavSamples(b.doc_id, b.payload)
        samples.grouped(frameLen).zipWithIndex.map { case (fr, i) =>
          var e = 0L; var peak = 0L
          var k = 0
          while (k < fr.length) {
            val v = fr(k).toLong
            e += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            k += 1
          }
          WavFrame(b.doc_id, i, fr.length, e, peak)
        }
      })
      .toDF()
  }

  /** chunk-walk a RIFF/WAVE payload to (sampleRate, int16 samples) —
    * shared by [[wavParse]] and [[decodeWavFrames]]. */
  private def wavSamples(id: Long, b: Array[Byte]): (Int, Array[Int]) = {
    require(b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF"
        && new String(b, 8, 4, "US-ASCII") == "WAVE", s"doc $id: not RIFF/WAVE")
    var pos = 12
    var sampleRate = -1
    var samples: Array[Int] = null
    while (pos + 8 <= b.length) {
      val cid = new String(b, pos, 4, "US-ASCII")
      val sz = rdLe32(b, pos + 4)
      val body = pos + 8
      cid match {
        case "fmt " =>
          require(rdLe16(b, body) == 1, s"doc $id: not PCM")
          require(rdLe16(b, body + 2) == 1, s"doc $id: not mono")
          sampleRate = rdLe32(b, body + 4)
          require(rdLe16(b, body + 14) == 16, s"doc $id: not 16-bit")
        case "data" =>
          require(body + sz <= b.length, s"doc $id: truncated data chunk")
          val n = sz / 2
          samples = Array.tabulate(n)(k => (rdLe16(b, body + 2 * k) << 16) >> 16)
        case _ => ()
      }
      pos = body + sz + (sz % 2)
    }
    require(sampleRate > 0 && samples != null, s"doc $id: missing fmt/data")
    (sampleRate, samples)
  }

  /** Decode a binary column of RIFF/WAVE payloads — partition-local. */
  def decodeWav(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b => wavParse(b.doc_id, b.payload)))
      .toDF()
  }

  /** Synthesize a (doc_id, payload) frame of real container bytes via a
    * partition-local generator — the ingest seam for payloads born
    * outside the row (object-store fetch, sidecar file), kept in
    * mapPartitions so the bytes never exist driver-side.
    */
  def synthesizePayloads(ids: DataFrame, idCol: String,
      gen: Long => Array[Byte]): Dataset[Blob] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map(id => Blob(id, gen(id))))
  }

  /** Deterministic TWIN-FAMILY P6 payload: docs `4k..4k+3` form a family
    * sharing one 8×8 grayscale base pattern, with per-member
    * perturbations that leave the image perceptually near-identical but
    * byte-distinct: a uniform brightness shift of `3·member` (flips NO
    * adjacent-pixel comparison — base values cap at 179+9, so no 8-bit
    * wrap) and one `+60` bumped pixel whose POSITION depends on the
    * member, which flips only the few dHash bits whose grid cells sample
    * it. The base pattern is the PRODUCT of two independent linear
    * hashes of (family, pixel) reduced mod 2¹⁶ before multiplying —
    * SQL-expressible yet properly scrambled across families (a plain
    * quadratic form left the pixel-difference structure shared between
    * families, and at ~10⁴ families strangers collided under the
    * Hamming threshold ~10³× above the random rate; the product form
    * measures stray pairs at ~2·10⁻⁴ with every in-family pair within
    * distance 3). Families near, strangers far — the planted fixture
    * for perceptual near-dup detection. Same honest container rules as
    * [[ppmPayload]] (comment line every third doc).
    */
  def ppmTwinPayload(docId: Long): Array[Byte] = {
    val fam = docId / 4
    val mem = (docId % 4).toInt
    val w = 8; val h = 8
    val header = new StringBuilder("P6\n")
    if (docId % 3 == 0) header.append(s"# twin c$docId\n")
    header.append(s"$w $h\n255\n")
    val hb = header.toString.getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    val bump = ((fam + mem * 17) % 64).toInt
    var i = 0
    while (i < w * h) {
      val a = (fam * 7919 + i + 1) % 65536
      val b = (fam * 104729 + i.toLong * 7919 + 12345) % 65536
      val v = ((a * b) % 180 + mem * 3 + (if (i == bump) 60 else 0)).toInt
      px(3 * i) = v.toByte; px(3 * i + 1) = v.toByte
      px(3 * i + 2) = v.toByte
      i += 1
    }
    hb ++ px
  }

  final case class PpmHash(doc_id: Long, dhash: Long)

  /** 56-bit dHash over a decoded P6 raster: grayscale sampled on a 9×7
    * nearest-neighbor grid (source pixel `(x·w/9, y·h/7)` — the fixed-
    * grid resize every perceptual-hash implementation performs, so the
    * hash is resolution-invariant), bit `y·8+x` set when the right
    * neighbor is brighter than the left. 56 bits keeps the value
    * positive in a signed 64-bit lane on BOTH engines (the [[
    * graft.llmdata.TextOps]] hash60 rule). A uniform brightness change
    * flips nothing; small localized edits flip only the bits whose grid
    * cells sample them — which is exactly what makes Hamming distance a
    * perceptual metric.
    */
  private[llmdata] def ppmDHash(id: Long, b: Array[Byte]): Long = {
    val (w, h, pos) = ppmHeader(id, b)
    def gray(sx: Int, sy: Int): Int = {
      val k = sy * w + sx
      ((b(pos + 3 * k) & 0xFF) + (b(pos + 3 * k + 1) & 0xFF) +
        (b(pos + 3 * k + 2) & 0xFF)) / 3
    }
    var hash = 0L
    var gy = 0
    while (gy < 7) {
      val sy = gy * h / 7
      var gx = 0
      while (gx < 8) {
        val l = gray(gx * w / 9, sy)
        val r = gray((gx + 1) * w / 9, sy)
        if (r > l) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** dHash a binary column of P6 payloads — decode and hash fused in one
    * partition-local pass; only (doc_id, 8-byte hash) ever shuffles.
    */
  def dhashPpm(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b => PpmHash(b.doc_id, ppmDHash(b.doc_id, b.payload))))
      .toDF()
  }

  /** per-band bucket occupancy cap for the perceptual tiers —
    * dHash bands are LOW-ENTROPY by nature (8-bit bands take only 256
    * values, and alternating-brightness patterns like 0x55/0xAA are
    * genuinely common), so unlike the minhash tiers the hazard here is
    * structural, not just adversarial. 256 clears every oracle
    * geometry (measured max occupancy 194 image / 135 audio at sf0.1)
    * while bounding a corpus-scale bucket to star pairs.
    */
  def phashMaxBucket(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("spark.graft.phash.maxBucket", "256").toInt

  /** Banded Hamming near-dup grouping over any ≤63-bit signature column
    * — the image analogue of [[Dedup.simhashPairs]], generalized: split
    * `bits` into `bands` equal slices; distance ≤ `bands−1` guarantees
    * at least one identical band (pigeonhole), so with `maxDist <
    * bands` the candidate tier has NO false negatives and the exact
    * `bit_count(xor)` verification kills the false positives — the pair
    * set equals brute force by construction (the spec cross-checks).
    * Band width trades recall for bucket entropy: 7×8-bit bands
    * guarantee distance ≤ 6 but give only 256 bucket values per band;
    * at corpus scale run 4×14-bit bands with maxDist 3 — same guarantee
    * structure as the simhash tier, 16k-value buckets. Either way the
    * bucket self-join goes through [[Dedup.bandedPairs]] with the
    * [[phashMaxBucket]] occupancy cap: a bucket over the cap star-pairs
    * around its min-id member instead of emitting the clique, so ONE
    * hot band value (0x55-style alternating patterns) can never go
    * quadratic — the exact design the minhash/RHP/SemDeDup tiers
    * carry, and the cap never fires at oracle geometry (`PhashSpec`
    * pins both the parity and the degenerate path). Output:
    * (id_a, id_b, hamming), id_a < id_b.
    */
  def hammingNearDups(sigs: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int, maxDist: Int): DataFrame = {
    require(bands > 0 && bits % bands == 0,
      s"bands must divide bits: $bits/$bands")
    require(maxDist < bands,
      s"pigeonhole guarantee needs maxDist < bands, got $maxDist/$bands")
    val bw = bits / bands
    val mask = (1L << bw) - 1
    val base = sigs.select(col(idCol).as("id"), col(hashCol).as("sig"))
    val keys = base
      .select(col("id"),
        explode(array((0 until bands).map(bb =>
          struct(lit(bb).as("band"),
            shiftright(col("sig"), bb * bw).bitwiseAND(mask)
              .as("bucket"))): _*))
          .as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.bucket").as("bucket"))
    Dedup.bandedPairs(keys, phashMaxBucket(sigs.sparkSession))
      .join(base.select(col("id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** frame sampling over an opaque "video" payload: one row per sampled
    * frame offset (every strideBytes), fingerprinted — explode + project,
    * partition-local. The fingerprint is md5 over the frame's UPPERCASE
    * HEX encoding (an ASCII string) rather than the raw bytes: equally
    * collision-resistant, and verifiable by engines whose md5 only
    * accepts strings.
    */
  def sampleFrames(
      docs: DataFrame,
      idCol: String,
      binCol: String,
      strideBytes: Int,
      frameBytes: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(expr(s"(length(payload) - 1) div $strideBytes"), lit(0))),
          i => md5(hex(col("payload").substr(
            i * strideBytes + 1, lit(frameBytes)))))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame_md5"))

  // ---- video (clip) modality: GVID container + temporal dHash ----

  /** Deterministic TWIN-FAMILY video clip: a length-validated GVID
    * container (magic + LE16 frame-count/width/height + 57 gray 9×7
    * frames) whose pixels come from the same product-form closed form
    * as [[ppmTwinPayload]] with the FRAME index mixed in. Family
    * members (docs 4k..4k+3) share the base clip; each member adds a
    * uniform +3·member brightness offset (invisible to the TEMPORAL
    * hash — every frame sum shifts by the same constant) and one
    * member-positioned BUMPED frame (+50/pixel), which flips only the
    * ≤2 envelope comparisons adjacent to it — the re-encoded /
    * re-graded clip near-dup byte-exact dedup misses. Max pixel value
    * 180+9+50 = 239: byte-safe, no 8-bit wrap.
    */
  def clipPayload(docId: Long): Array[Byte] = {
    val fam = docId / 4
    val mem = (docId % 4).toInt
    val nF = 57; val w = 9; val h = 7
    val bump = ((fam + mem * 29) % 57).toInt
    val out = new Array[Byte](10 + nF * w * h)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    le16(nF).copyToArray(out, 4)
    le16(w).copyToArray(out, 6)
    le16(h).copyToArray(out, 8)
    var p = 10
    var f = 0
    while (f < nF) {
      var i = 0
      while (i < w * h) {
        val a = (fam * 7919 + f * 613 + i + 1) % 65536
        val b = (fam * 104729 + f * 31 + i.toLong * 7919 + 12345) % 65536
        val v = ((a * b) % 181 + mem * 3 +
          (if (f == bump) 50 else 0)).toInt
        out(p) = v.toByte
        p += 1
        i += 1
      }
      f += 1
    }
    out
  }

  /** 56-bit TEMPORAL dHash of a GVID clip, fused into the container
    * walk: one pass accumulates each frame's luminance SUM (integer —
    * no mean, no rounding), bit f set when frame f+1 is brighter than
    * frame f. Invariant under any uniform per-pixel brightness offset
    * or positive rescale (all frame sums move monotonically together);
    * a single edited/bumped frame flips only its two adjacent
    * comparisons — Hamming distance is a temporal-perceptual metric,
    * the video analogue of the audio energy envelope. Malformed
    * containers (bad magic, truncated frames, frame count off the
    * 56-bit budget) REJECT with the doc id, same contract as the
    * PPM/WAV codecs.
    */
  private[llmdata] def clipTemporalDHash(id: Long, b: Array[Byte]): Long = {
    if (b.length < 10 || b(0) != 'G' || b(1) != 'V' || b(2) != 'I' ||
        b(3) != 'D')
      throw new IllegalArgumentException(
        s"doc $id: not a GVID clip container")
    val nF = rdLe16(b, 4); val w = rdLe16(b, 6); val h = rdLe16(b, 8)
    if (nF < 2 || nF > 57 || w <= 0 || h <= 0)
      throw new IllegalArgumentException(
        s"doc $id: GVID geometry out of range ($nF frames, ${w}x$h)")
    if (b.length != 10 + nF * w * h)
      throw new IllegalArgumentException(
        s"doc $id: GVID truncated (${b.length} bytes for $nF ${w}x$h frames)")
    val sums = new Array[Long](nF)
    var p = 10
    var f = 0
    while (f < nF) {
      var s = 0L
      var i = 0
      while (i < w * h) { s += (b(p) & 0xFF); p += 1; i += 1 }
      sums(f) = s
      f += 1
    }
    var d = 0L
    f = 0
    while (f < nF - 1) {
      if (sums(f + 1) > sums(f)) d |= 1L << f
      f += 1
    }
    d
  }

  def dhashClip(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("payload"))
      .as[Blob]
      .mapPartitions(_.map(b =>
        PpmHash(b.doc_id, clipTemporalDHash(b.doc_id, b.payload))))
      .toDF()
  }
}
