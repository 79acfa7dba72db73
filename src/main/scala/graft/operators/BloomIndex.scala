package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-FILE Bloom membership index — the data-skipping story zone maps
  * cannot tell. Zone maps (s18/s21) skip on RANGE overlap, which needs
  * the key CLUSTERED; on a hash-partitioned layout every file's
  * [min, max] spans the whole domain and a point lookup opens
  * everything. A per-file Bloom filter answers "might this file contain
  * THIS key?" regardless of clustering: 4 hash positions per key, a
  * file survives a probe only if every bit is set. False positives cost
  * an extra file read; false negatives are impossible (a key's bits are
  * all set in the file that wrote it), so skipping stays a pure
  * optimization — the same contract Parquet's own column bloom filters
  * and Iceberg's bloom index give a table format's planner.
  *
  * Scale shape: the index is built in ONE distributed pass — 4 bit
  * positions per distinct (file, key), OR-folded into 64-bit words by a
  * hash aggregate — and its SIZE is files·(m/64) rows (metadata, like
  * footers). Probing is a join of that metadata relation against
  * |probe keys|·4 rows; only the survivor file LIST reaches the driver.
  *
  * (No reference counterpart — lake-layout extension, same family as
  * s17/s18/s22.)
  */
object BloomIndex {

  val Hashes = 4

  /** Build the per-file index over `keyCol` (any hashable type): one
    * row per (file, word) with the OR of all key bits in that word.
    * `mBits` must be a multiple of 64.
    */
  def build(s: SparkSession, path: String, keyCol: String, mBits: Long)
      : DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    // no distinct: bit_or is idempotent, so duplicate (file, key) rows
    // re-set the same bits for free — a pre-dedup would cost a full
    // data-relation shuffle before the expansion, the build's only
    // non-metadata exchange is the partial-aggregated (file, word) fold
    val keys = s.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), col(keyCol).as("k"))
    (0 until Hashes).map { j =>
        keys.select(col("file"),
          pmod(xxhash64(lit(j), col("k")), lit(mBits)).as("bit"))
      }
      .reduce(_.unionByName(_))
      .select(col("file"), expr("bit div 64").as("word"),
        expr("shiftleft(1L, cast(bit % 64 as int))").as("mask"))
      .groupBy(col("file"), col("word"))
      .agg(bit_or(col("mask")).as("bits"))
  }

  /** Files that MIGHT contain at least one probe key: for each
    * (file, key), every one of the key's hash bits must be set. Runs as
    * a join over the metadata-sized index relation; only the survivor
    * path list is collected.
    */
  def survivors(s: SparkSession, index: DataFrame, probeKeys: Seq[Long],
      mBits: Long): Seq[String] = {
    import s.implicits._
    if (probeKeys.isEmpty) return Nil
    val probeBits = probeKeys.toDF("k")
      .as("p")
    val expanded = (0 until Hashes).map { j =>
        probeBits.select(col("k"),
          pmod(xxhash64(lit(j), col("k")), lit(mBits)).as("bit"))
      }
      .reduce(_.unionByName(_))
      // two hashes of one key can land in the same word — OR the masks
      // so the containment test is per-WORD, then demand every word hit
      .select(col("k"), expr("bit div 64").as("word"),
        expr("shiftleft(1L, cast(bit % 64 as int))").as("mask"))
      .groupBy(col("k"), col("word"))
      .agg(bit_or(col("mask")).as("mask"))
    val wordsPerKey = expanded.groupBy(col("k"))
      .agg(count(lit(1)).as("n_words"))
    expanded
      .join(index, Seq("word"))
      .filter((col("bits").bitwiseAND(col("mask"))) === col("mask"))
      .groupBy(col("file"), col("k"))
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(wordsPerKey), Seq("k"))
      .filter(col("n_hit") === col("n_words"))
      .select(col("file")).distinct()
      .as[String].collect().toSeq
  }
}
