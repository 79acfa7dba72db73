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
}
