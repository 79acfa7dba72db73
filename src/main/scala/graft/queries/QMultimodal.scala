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
    // side, mirrored as pure SQL in the oracle (ASCII text → bytes ==
    // chars).
    Q("mm_decode_stub",
      (s, d) => Multimodal.decodeBlobs(
        Tables.documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload"),
      Some("""SELECT doc_id,
                     CAST(length(text) AS INT) AS byte_len,
                     CAST(length(text) % 640 AS INT) AS width,
                     CAST(length(text) % 480 AS INT) AS height,
                     upper(hex(substr(text, 1, 8))) AS header_hex
              FROM documents""")),

    // feature-extract / resize stub: payload bytes downsampled into 8
    // equal buckets, each reduced to its exact integer mean — the
    // fixed-width featurizer shape, partition-local. ASCII text → byte i
    // == ascii(char i), so the oracle mirrors with generate_series.
    Q("mm_feature_buckets",
      (s, d) => Multimodal.featureBuckets(
        Tables.documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", buckets = 8),
      Some("""SELECT doc_id,
                     CAST(((i - 1) * 8) // length(text) AS INT) AS bucket,
                     sum(CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))
                       // count(*) AS mean_code
              FROM documents CROSS JOIN generate_series(1, 5000) g(i)
              WHERE i <= length(text)
              GROUP BY 1, 2""")),

    // frame sampling: one row per 64-byte stride, md5 fingerprint of a
    // 16-byte "frame" at each offset.
    Q("mm_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        Tables.documents(s, d).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", strideBytes = 64, frameBytes = 16),
      Some("""SELECT doc_id, CAST(i AS INT) AS frame_idx,
                     md5(substr(text, CAST(i * 64 + 1 AS INT), 16)) AS frame_md5
              FROM documents CROSS JOIN generate_series(0, 100) g(i)
              WHERE i <= greatest((length(text) - 1) // 64, 0)"""))
  )
}
