package graft.queries

import graft.Tables
import graft.llmdata.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries: the documents' text bytes stand in for
  * opaque media payloads (UTF-8 → binary), so the full binary plumbing —
  * schema, batch shape, partition-local decode, frame sampling — runs for
  * real while the codec itself is a deterministic stub (see
  * [[graft.llmdata.Multimodal]]). Metadata derivation is mirrorable in
  * SQL, so even the stubbed decode is oracle-checked.
  */
object QMultimodal extends Registry {

  def qs: Seq[Q] = Seq(

    // binary ingest + batched decode: byte length, fake dimensions,
    // 8-byte header hex — computed row-wise in mapPartitions on the Spark
    // side. Oracle is BYTE-safe: octet_length / hex over the UTF-8 blob
    // (encode(text)), never character positions, so non-ASCII documents
    // can't silently diverge.
    Q("mm_decode_stub",
      (s, d) => Multimodal.decodeBlobs(
        Tables.documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload"),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INT) AS byte_len,
                     CAST(octet_length(encode(text)) % 640 AS INT) AS width,
                     CAST(octet_length(encode(text)) % 480 AS INT) AS height,
                     substr(hex(encode(text)), 1, 16) AS header_hex
              FROM documents""")),

    // feature-extract / resize stub: payload bytes downsampled into 8
    // equal buckets, each reduced to its exact integer mean — the
    // fixed-width featurizer shape, partition-local. Oracle decodes each
    // byte from the blob's hex pair (strpos arithmetic) — byte-safe, no
    // position cap — and casts the HUGEINT integer-division mean back to
    // BIGINT so both engines emit int64.
    Q("mm_feature_buckets",
      (s, d) => Multimodal.featureBuckets(
        Tables.documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", buckets = 8),
      Some("""WITH b AS (
                SELECT doc_id, octet_length(encode(text)) AS n,
                       hex(encode(text)) AS h
                FROM documents
              ), e AS (
                SELECT doc_id, n, h,
                       unnest(range(0, CAST(n AS BIGINT))) AS i
                FROM b
              )
              SELECT doc_id,
                     CAST((i * 8) // n AS INT) AS bucket,
                     CAST(sum(
                         (strpos('0123456789ABCDEF',
                                 substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
                       + (strpos('0123456789ABCDEF',
                                 substr(h, CAST(2*i+2 AS INT), 1)) - 1)
                       ) // count(*) AS BIGINT) AS mean_code
              FROM e
              GROUP BY 1, 2""")),

    // frame sampling: one row per 64-byte stride; fingerprint = md5 of
    // the frame's UPPERCASE HEX (both engines hash a plain ASCII string,
    // so the row stays byte-safe even though DuckDB's md5 only accepts
    // VARCHAR).
    Q("mm_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        Tables.documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", strideBytes = 64, frameBytes = 16),
      Some("""WITH b AS (
                SELECT doc_id, hex(encode(text)) AS h,
                       octet_length(encode(text)) AS n
                FROM documents
              ), e AS (
                SELECT doc_id, h,
                       unnest(range(0, greatest((n - 1) // 64, 0) + 1)) AS i
                FROM b
              )
              SELECT doc_id, CAST(i AS INT) AS frame_idx,
                     md5(substr(h, CAST(i*128+1 AS INT), 32)) AS frame_md5
              FROM e""")),

    // Exact PAYLOAD dedup — the dedup ladder's tier 1 applied to the
    // multimodal column: byte-identical payloads (re-hosted images,
    // mirrored files) collapse to one keeper per md5 regardless of any
    // text-side metadata. Hashes the RAW bytes (no normalization — a
    // one-bit difference is a different asset), one (hash → count,
    // min-keeper) shuffle of fixed-width rows; the payload itself never
    // leaves the scan. Every raw text is byte-unique at sf0.01, so —
    // like tx_redact_pii manufactures its PII — one doc in five carries
    // one of 16 shared "stock asset" payloads instead of its own bytes,
    // giving the dedup genuine multi-copy groups to collapse.
    Q("mm_payload_dedup",
      (s, d) => {
        val payload = when(col("doc_id") % 5 === 0,
            concat(lit("stockimage"), (col("doc_id") % 16).cast("string")))
          .otherwise(col("text")).cast("binary")
        Tables.documents(s, d)
          .select(col("doc_id"), md5(payload).as("pfp"),
            length(payload).cast("long").as("n_bytes"))
          .groupBy(col("pfp"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("doc_id")).as("keeper"),
            max(col("n_bytes")).as("n_bytes"))
      },
      Some("""WITH p AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN 'stockimage' || CAST(doc_id % 16 AS VARCHAR)
                            ELSE text END AS payload
                FROM documents)
              SELECT md5(payload) AS pfp, count(*) AS n_copies,
                     min(doc_id) AS keeper,
                     CAST(max(octet_length(encode(payload))) AS BIGINT) AS n_bytes
              FROM p GROUP BY 1""")),

    // REAL image codec behind the seam: binary-PPM (P6) payloads are
    // synthesized per doc (real container bytes — every third doc gets a
    // `#` comment line, so a fixed-offset slice can't pass) and decoded
    // by an actual header-parsing JDK-only decoder in mapPartitions:
    // width/height from the whitespace-scanned header, per-channel
    // integer pixel means from the packed RGB raster. Pixel bytes are
    // closed-form in (doc_id, i), so the oracle re-derives every raster
    // byte and must agree on the decoded features exactly. Payload bytes
    // never shuffle — synthesis and decode share one partition-local pass.
    Q("mm_ppm_decode",
      (s, d) => Multimodal.decodePpm(
        Multimodal.synthesizePayloads(
          Tables.documents(s, d), "doc_id", Multimodal.ppmPayload).toDF(),
        "doc_id", "payload"),
      Some("""WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w,
                           3 + doc_id % 4 AS h
                         FROM documents),
                e AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS i
                      FROM d),
                v AS (SELECT doc_id, w, h, i,
                        (doc_id * 31 + i * 7) % 256 AS bv
                      FROM e)
              SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                     CAST(w * h AS BIGINT) AS n_pixels,
                     CAST(sum(CASE WHEN i % 3 = 0 THEN bv ELSE 0 END) // (w * h) AS BIGINT) AS mean_r,
                     CAST(sum(CASE WHEN i % 3 = 1 THEN bv ELSE 0 END) // (w * h) AS BIGINT) AS mean_g,
                     CAST(sum(CASE WHEN i % 3 = 2 THEN bv ELSE 0 END) // (w * h) AS BIGINT) AS mean_b
              FROM v GROUP BY doc_id, w, h""")),

    // REAL audio codec behind the seam: RIFF/WAVE PCM16 payloads (every
    // third doc carries an unknown LIST chunk, so the decoder must WALK
    // the chunk list — fmt parse, word-aligned skip, data extract) with
    // closed-form little-endian samples. Decoded stats are integer-exact:
    // mean over +32768-offset samples (keeps both engines' integer
    // division on non-negative ground) and peak |sample|.
    Q("mm_wav_decode",
      (s, d) => Multimodal.decodeWav(
        Multimodal.synthesizePayloads(
          Tables.documents(s, d), "doc_id", Multimodal.wavPayload).toDF(),
        "doc_id", "payload"),
      Some("""WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS n FROM documents),
                e AS (SELECT doc_id, n, unnest(range(0, n)) AS k FROM d),
                v AS (SELECT doc_id, n,
                        (doc_id * 131 + k * 17) % 65536 - 32768 AS s
                      FROM e)
              SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
                     CAST(n AS BIGINT) AS n_samples,
                     CAST(sum(s + 32768) // n AS BIGINT) AS mean_offset,
                     CAST(max(abs(s)) AS BIGINT) AS peak_abs
              FROM v GROUP BY doc_id, n""")),

    // Decode + FRAME-FEATURE extraction fused (the audio analogue of the
    // ppm resize fusion): per-8-sample short-time energy (Σs²) and peak —
    // the profile silence-trimming / clipping filters consume — computed
    // in the same partition-local pass that chunk-walks the RIFF
    // container. Sample arrays never shuffle; one row per frame,
    // trailing partial frame kept with its true length. Integer-exact,
    // so the closed-form oracle re-derives every frame.
    Q("mm_wav_energy",
      (s, d) => Multimodal.decodeWavFrames(
        Multimodal.synthesizePayloads(
          Tables.documents(s, d), "doc_id", Multimodal.wavPayload).toDF(),
        "doc_id", "payload", frameLen = 8),
      Some("""WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS n FROM documents),
                e AS (SELECT doc_id, n, unnest(range(0, n)) AS k FROM d),
                v AS (SELECT doc_id, CAST(k // 8 AS INT) AS frame_idx,
                        (doc_id * 131 + k * 17) % 65536 - 32768 AS s
                      FROM e)
              SELECT doc_id, frame_idx,
                     CAST(count(*) AS INT) AS n_in_frame,
                     CAST(sum(s * s) AS BIGINT) AS energy,
                     CAST(max(abs(s)) AS BIGINT) AS peak_abs
              FROM v GROUP BY doc_id, frame_idx""")),

    // Decode + resize FUSED in one partition-local pass: nearest-
    // neighbor 2× downsample (output (x,y) samples source (2x,2y); odd
    // dims round up) with per-channel means over the RESIZED raster.
    // The oracle re-derives exactly the sampled bytes from the closed
    // form — an off-by-one in the stride/edge handling cannot hash-pass.
    Q("mm_ppm_resize",
      (s, d) => Multimodal.resizePpm(
        Multimodal.synthesizePayloads(
          Tables.documents(s, d), "doc_id", Multimodal.ppmPayload).toDF(),
        "doc_id", "payload"),
      Some("""WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w,
                           3 + doc_id % 4 AS h
                         FROM documents),
                r AS (SELECT doc_id, w, h, (w + 1) // 2 AS rw,
                             (h + 1) // 2 AS rh
                      FROM d),
                e AS (SELECT doc_id, w, rw, rh,
                        unnest(range(0, rw * rh * 3)) AS j
                      FROM r),
                v AS (SELECT doc_id, rw, rh,
                        (doc_id * 31
                          + (3 * ((2 * ((j // 3) // rw)) * w
                                  + 2 * ((j // 3) % rw)) + j % 3) * 7)
                          % 256 AS bv,
                        j % 3 AS c
                      FROM e)
              SELECT doc_id, CAST(rw AS INT) AS out_w,
                     CAST(rh AS INT) AS out_h,
                     CAST(rw * rh AS BIGINT) AS n_pixels,
                     CAST(sum(CASE WHEN c = 0 THEN bv ELSE 0 END)
                       // (rw * rh) AS BIGINT) AS mean_r,
                     CAST(sum(CASE WHEN c = 1 THEN bv ELSE 0 END)
                       // (rw * rh) AS BIGINT) AS mean_g,
                     CAST(sum(CASE WHEN c = 2 THEN bv ELSE 0 END)
                       // (rw * rh) AS BIGINT) AS mean_b
              FROM v GROUP BY doc_id, rw, rh""")),

    // PERCEPTUAL near-dup tier over the decoded raster — the image
    // analogue of dd_simhash, and the member of the dedup family that
    // catches re-encoded / brightness-shifted / lightly-edited copies a
    // byte-exact fingerprint (mm_payload_dedup) can never see. Docs
    // 4k..4k+3 are planted twin families (shared base pattern, uniform
    // brightness shift + one member-positioned bumped pixel); the 56-bit
    // dHash is computed in the same partition-local pass that decodes
    // the container, then 7×8-bit Hamming bands produce candidates with
    // guaranteed recall at distance ≤ 6 and bit_count(xor) verifies —
    // so the pair table equals brute force by construction, which is
    // exactly what the oracle computes (all-pairs over the closed-form
    // hashes). Payload bytes never shuffle; only (id, 8-byte hash) does.
    Q("mm_phash_neardup",
      (s, d) => Multimodal.hammingNearDups(
        Multimodal.dhashPpm(
          Multimodal.synthesizePayloads(
            Tables.documents(s, d), "doc_id",
            Multimodal.ppmTwinPayload).toDF(),
          "doc_id", "payload"),
        "doc_id", "dhash", bits = 56, bands = 7, maxDist = 6),
      Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS fam,
                                doc_id % 4 AS mem
                         FROM documents),
                cell AS (SELECT doc_id, fam, mem, gy, c,
                                ((gy * 8) // 7) * 8 + ((c * 8) // 9) AS i
                         FROM d, generate_series(0, 6) g1(gy),
                              generate_series(0, 8) g2(c)),
                val AS (SELECT doc_id, gy, c,
                               (((fam*7919 + i + 1) % 65536)
                                 * ((fam*104729 + i*7919 + 12345) % 65536))
                                 % 180
                                 + mem*3
                                 + CASE WHEN i = (fam + mem*17) % 64
                                        THEN 60 ELSE 0 END AS v
                        FROM cell),
                sig AS (SELECT l.doc_id,
                               CAST(sum(CASE WHEN r.v > l.v
                                 THEN (CAST(1 AS BIGINT)
                                       << CAST(l.gy*8 + l.c AS INT))
                                 ELSE 0 END) AS BIGINT) AS dh
                        FROM val l JOIN val r
                          ON r.doc_id = l.doc_id AND r.gy = l.gy
                             AND r.c = l.c + 1
                        GROUP BY l.doc_id)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.dh, b.dh)) <= 6""")),

    // PERCEPTUAL near-dup for AUDIO — the same banded-Hamming operator,
    // fed by a 56-bit dHash over the short-time ENERGY ENVELOPE (bit f:
    // frame f+1 louder than frame f), computed in the partition-local
    // chunk-walk. Gain-invariant by construction: a volume change
    // scales every frame energy identically, so re-levelled copies hash
    // identically — the audio failure mode byte-exact dedup misses.
    // Twin families: one base waveform per 4 docs, member-scaled
    // amplitude (invisible to the hash) + one member-positioned bumped
    // frame (flips only adjacent envelope bits). The oracle re-derives
    // every sample, energy, hash bit and brute-forces all pairs.
    Q("mm_audio_neardup",
      (s, d) => Multimodal.hammingNearDups(
        Multimodal.dhashWav(
          Multimodal.synthesizePayloads(
            Tables.documents(s, d), "doc_id",
            Multimodal.wavTwinPayload).toDF(),
          "doc_id", "payload", frameLen = 4),
        "doc_id", "dhash", bits = 56, bands = 7, maxDist = 6),
      Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS fam,
                                doc_id % 4 AS mem
                         FROM documents),
                sm AS (SELECT doc_id, k,
                              ((((fam*7919 + k + 1) % 65536)
                                 * ((fam*104729 + k*7919 + 12345) % 65536))
                                 % 2000 - 1000
                                + CASE WHEN k // 4 = (fam + mem*29) % 57
                                       THEN 500 ELSE 0 END)
                              * (mem + 1) AS s
                       FROM d, generate_series(0, 227) g(k)),
                en AS (SELECT doc_id, CAST(k // 4 AS INT) AS f,
                              CAST(sum(s*s) AS BIGINT) AS e
                       FROM sm GROUP BY doc_id, k // 4),
                sig AS (SELECT l.doc_id,
                               CAST(sum(CASE WHEN r.e > l.e
                                 THEN (CAST(1 AS BIGINT)
                                       << CAST(l.f AS INT))
                                 ELSE 0 END) AS BIGINT) AS dh
                        FROM en l JOIN en r
                          ON r.doc_id = l.doc_id AND r.f = l.f + 1
                        GROUP BY l.doc_id)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.dh, b.dh)) <= 6""")),

    // PERCEPTUAL near-dup for VIDEO — the third modality through the
    // SAME banded-Hamming operator, completing the image/audio/video
    // triple. Payload is a length-validated GVID container (57 gray
    // 9×7 frames); the partition-local walk fuses decode and feature
    // extraction into one pass over the bytes, accumulating each
    // frame's integer luminance sum, and the signature is the 56-bit
    // TEMPORAL dHash (bit f: frame f+1 brighter than frame f) — the
    // video analogue of the audio energy envelope, invariant under
    // re-grading (uniform brightness/contrast shifts move every frame
    // sum together) while a single edited frame flips only its two
    // adjacent comparisons. Twin families: shared base clip per 4
    // docs, member-uniform brightness offset (invisible) + one
    // member-positioned bumped frame (≤2 bits). The oracle re-derives
    // every pixel, frame sum and hash bit, then brute-forces all
    // pairs — equal to the banded tier by pigeonhole (`ClipSpec`).
    Q("mm_clip_neardup",
      (s, d) => Multimodal.hammingNearDups(
        Multimodal.dhashClip(
          Multimodal.synthesizePayloads(
            Tables.documents(s, d), "doc_id",
            Multimodal.clipPayload).toDF(),
          "doc_id", "payload"),
        "doc_id", "dhash", bits = 56, bands = 7, maxDist = 6),
      Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS fam,
                                doc_id % 4 AS mem
                         FROM documents),
                px AS (SELECT doc_id, f, i,
                              (((fam*7919 + f*613 + i + 1) % 65536)
                                * ((fam*104729 + f*31 + i*7919 + 12345)
                                   % 65536)) % 181
                                + mem*3
                                + CASE WHEN f = (fam + mem*29) % 57
                                       THEN 50 ELSE 0 END AS v
                       FROM d, generate_series(0, 56) gf(f),
                            generate_series(0, 62) gi(i)),
                fs AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS s
                       FROM px GROUP BY 1, 2),
                sig AS (SELECT l.doc_id,
                               CAST(sum(CASE WHEN r.s > l.s
                                 THEN (CAST(1 AS BIGINT)
                                       << CAST(l.f AS INT))
                                 ELSE 0 END) AS BIGINT) AS dh
                        FROM fs l JOIN fs r
                          ON r.doc_id = l.doc_id AND r.f = l.f + 1
                        GROUP BY l.doc_id)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.dh, b.dh)) <= 6"""))
  )
}
