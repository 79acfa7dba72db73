package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.operators.BloomIndex
import org.apache.spark.sql.functions._

/** Per-file Bloom index (s29_bloom_index) — the three claims that make
  * it an INDEX and not a bet:
  *
  *  1. No false negatives: every file that truly holds a probe key is
  *     in the survivor set (a key's bits are all set in its own file).
  *  2. It actually skips: the survivor set is a strict subset of the
  *     files — on a layout where the ZONE-MAP planner can skip NOTHING
  *     (hash-clustered: every file's key zone covers the probes), which
  *     is precisely the gap this index exists to fill.
  *  3. The answer is index-invariant: reading only survivors equals the
  *     direct full-scan filter.
  */
class BloomIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val m = 1L << 17

  private def fixture(): (String, Seq[Long]) = {
    val dir = graft.Scratch.dirFor("s29_bloom_spec", sf)
    Tables.lineitem(spark, sf)
      .repartition(16, col("l_suppkey"))
      .write.mode("overwrite").parquet(s"$dir/t")
    val probes = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 997 === 0)
      .select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey")).limit(5)
      .as(org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    assert(probes.nonEmpty, "fixture must yield probe keys")
    (s"$dir/t", probes)
  }

  test("no false negatives, strict skipping, zone maps blind on this layout") {
    val (path, probes) = fixture()
    val index = BloomIndex.build(spark, path, "l_orderkey", m)
    val survivors = BloomIndex.survivors(spark, index, probes, m).toSet
    val all = spark.read.parquet(path)
      .select(col("_metadata.file_path")).distinct()
      .as(org.apache.spark.sql.Encoders.STRING).collect().toSet
    val truly = spark.read.parquet(path)
      .filter(col("l_orderkey").isin(probes: _*))
      .select(col("_metadata.file_path")).distinct()
      .as(org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(truly.subsetOf(survivors),
      s"false negative: ${truly -- survivors}")
    assert(survivors.subsetOf(all))
    assert(survivors.size < all.size,
      s"bloom skipped nothing: ${survivors.size} of ${all.size}")
    // the same point probes through the ZONE-MAP planner: on a
    // hash-clustered layout every file's zone covers every probe — the
    // range planner keeps all files, the bloom planner skips
    val zoneKept = probes.flatMap(k =>
      QFilters.zoneMapSurvivors(spark, path, lo = k, hi = k)).toSet
    assert(zoneKept == all,
      "zone maps skipped files on a hash layout — fixture broken")
  }

  test("survivor-only read equals the direct filter; shipped query matches") {
    val (path, probes) = fixture()
    val index = BloomIndex.build(spark, path, "l_orderkey", m)
    val files = BloomIndex.survivors(spark, index, probes, m)
    val got = spark.read.parquet(files: _*)
      .filter(col("l_orderkey").isin(probes: _*))
      .select(col("l_orderkey"), col("l_linenumber"))
    val want = spark.read.parquet(path)
      .filter(col("l_orderkey").isin(probes: _*))
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    assert(SparkEntry.queries("s29_bloom_index")(spark, sf).count() > 0)
  }
}
