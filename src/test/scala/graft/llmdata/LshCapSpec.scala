package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The band-bucket occupancy cap ([[Dedup.bandedPairs]] /
  * [[Dedup.capProbeKeys]]): one deliberately degenerate bucket must
  * produce a LINEAR star instead of the quadratic clique, buckets at or
  * under the cap must be untouched, and connected-component
  * canonicalization must see the same reachability either way.
  */
class LshCapSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** band keys with one bucket of `big` members and one of `small` */
  private def keys(big: Int, small: Int): DataFrame = {
    import spark.implicits._
    ((0 until big).map(i => (i.toLong, 0, "degenerate")) ++
      (0 until small).map(i => (100L + i, 1, "normal")))
      .toDF("id", "band", "bucket")
  }

  test("oversized bucket star-pairs around its min id; small bucket keeps the clique") {
    val pairs = Dedup.bandedPairs(keys(big = 20, small = 4), maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val starred = pairs.filter(_._2 < 100L)
    val clique = pairs.filter(_._2 >= 100L)
    // 20-member bucket: 19 star pairs (0, i), not 190 clique pairs
    assert(starred == (1 until 20).map(i => (0L, i.toLong)).toSet)
    // 4-member bucket stays a full 6-pair clique
    assert(clique == (for {
      a <- 100L until 104L; b <- (a + 1) until 104L
    } yield (a, b)).toSet)
  }

  test("cap at or above occupancy is the identity") {
    val uncapped = Dedup.bandedPairs(keys(20, 4), maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val atOcc = Dedup.bandedPairs(keys(20, 4), maxBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atOcc == uncapped && uncapped.size == 190 + 6)
  }

  test("star pairs reach the same canonical clusters as the clique") {
    import spark.implicits._
    val clique = Dedup.bandedPairs(keys(20, 0), maxBucket = Int.MaxValue)
    val star = Dedup.bandedPairs(keys(20, 0), maxBucket = 8)
    val viaClique = Dedup.canonicalClusters(clique)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaStar = Dedup.canonicalClusters(star)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStar == viaClique &&
      viaStar == (0 until 20).map(i => i.toLong -> 0L).toMap)
  }

  test("oversizedBuckets reports exactly the capped buckets") {
    val over = Dedup.oversizedBuckets(keys(20, 4), maxBucket = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(over.toSeq == Seq((0, "degenerate", 20L)))
  }

  test("capProbeKeys keeps the lowest ids per bucket, deterministic") {
    val kept = Dedup.capProbeKeys(keys(20, 4), maxBucket = 8)
      .collect().map(r => (r.getString(2), r.getLong(0)))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sorted.toSeq }
    assert(kept("degenerate") == (0L until 8L))
    assert(kept("normal") == (100L until 104L))
  }

  test("default caps clear the oracle geometry at sf0.001") {
    // the driver's correctness harness relies on the cap never firing
    // at oracle scale: assert no bucket reaches the default caps
    assertCapsClear("/root/testdata/sf0.001")
  }

  test("default caps clear the sf0.01 oracle and sf0.1 bench geometry") {
    // sf0.01 is the driver's DuckDB-compare scale; sf0.1 is the bench
    // scale — at BOTH the capped queries must compute the exact clique
    // semantics the uncapped oracle SQL mirrors. (The first shipped RHP
    // default, 128, silently starred every sf0.1 bucket: measured max
    // occupancy there is 220.)
    assertCapsClear("/root/testdata/sf0.01")
    assertCapsClear("/root/testdata/sf0.1")
  }

  private def assertCapsClear(d: String): Unit = {
    val prof = Dedup.docProfilesLocal(
      graft.Tables.documents(spark, d), "doc_id", "text", n = 5, k = 32)
    val mOver = Dedup.oversizedBuckets(
      Dedup.bandKeys(prof, 32, 4), Dedup.lshMaxBucket(spark)).count()
    assert(mOver == 0L, s"minhash bucket over cap at $d")
    val rk = Dedup.rhpBandKeys(graft.Tables.embeddings(spark, d))
    val rOver = Dedup.oversizedBuckets(rk, Dedup.rhpMaxBucket(spark)).count()
    assert(rOver == 0L, s"rhp bucket over cap at $d")
  }
}
