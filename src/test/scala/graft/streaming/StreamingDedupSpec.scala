package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup over a MemoryStream: duplicates collapse across
  * micro-batches, and the watermarked variant EVICTS key state at the
  * horizon (re-emitting a key that returns after it) — the bounded-state
  * contract an unbounded ingest needs.
  */
class StreamingDedupSpec extends SparkSpec {

  case class Doc(doc_id: Long, text: String, ts: Timestamp)
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("dropDuplicates collapses re-arrivals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.distinctFingerprints(input.toDF())
      .writeStream.format("memory").queryName("dedup_plain")
      .outputMode("append").start()
    input.addData(Doc(1, "alpha beta", ts(0)), Doc(2, "gamma", ts(1)))
    q.processAllAvailable()
    input.addData(Doc(3, "ALPHA   beta", ts(2))) // normalizes to doc 1's text
    q.processAllAvailable()
    assert(spark.table("dedup_plain").count() == 2)
    q.stop()
  }

  test("watermarked dedup evicts state at the horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.distinctFingerprintsWithinWatermark(
        input.toDF(), "ts", horizon = "10 seconds")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    // batch 1: the key arrives; duplicate inside the horizon collapses
    input.addData(Doc(1, "alpha beta", ts(0)), Doc(2, "alpha beta", ts(5)))
    q.processAllAvailable()
    // batch 2: advance the watermark far past ts(0)+10s → key state evicted
    input.addData(Doc(3, "gamma", ts(100)))
    q.processAllAvailable()
    // batch 3: the SAME key re-arrives after eviction → re-emitted
    input.addData(Doc(4, "alpha beta", ts(101)))
    q.processAllAvailable()
    val fps = spark.table("dedup_wm").select(col("fp")).collect().map(_.getString(0))
    assert(fps.length == 3, s"expected re-emission after eviction: ${fps.length}")
    assert(fps.toSet.size == 2) // alpha-beta twice, gamma once
    q.stop()
  }

  test("admission is invariant to how arrivals split into micro-batches") {
    import spark.implicits._
    import graft.llmdata.{Dedup, TextOps}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // corpus: three docs; arrivals: one exact dup, one near-dup (same
    // text, one word changed), two genuinely new docs
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "colorless green ideas sleep furiously in the summer night sky"),
      (3L, "pack my box with five dozen liquor jugs and nothing else"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "colorless green ideas sleep furiously in the winter night sky"),
      (12L, "sphinx of black quartz judge my vow tonight before midnight"),
      (13L, "how vexingly quick daft zebras jump over complacent hounds"))
    val corpusProf = Dedup.docProfilesLocal(corpus, "doc_id", "text", n = 5, k = 32)
    val corpusKeys = Dedup.bandKeys(corpusProf, k = 32, bands = 4)
    val corpusFps = corpus.select(TextOps.fingerprint(col("text")).as("fp"))
    def admit(batch: org.apache.spark.sql.DataFrame) =
      Dedup.admitOnProfiles(
        Dedup.docProfilesLocal(batch, "doc_id", "text", n = 5, k = 32),
        batch.select(col("doc_id").as("id"),
          TextOps.fingerprint(col("text")).as("fp")),
        corpusProf, corpusKeys, corpusFps, k = 32, bands = 4, threshold = 0.5)
    // all-at-once reference
    val allAtOnce = admit(arrivals.toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    // streamed in TWO micro-batches through the same foreachBatch body
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[Long]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= admit(batch).collect().map(_.getLong(0)); ()
      }
      .start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == allAtOnce,
      s"micro-batch split changed the admitted set: $got vs $allAtOnce")
    // and the dedup logic actually fired: exact dup 10 rejected
    assert(!allAtOnce.contains(10L) && allAtOnce.contains(12L))
  }

  test("foreachBatch LSH admission equals the batch admission operator") {
    val sf = "/root/testdata/sf0.001"
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = rows("stream_lsh_admit")
    val batch = rows("dd_incremental_admit")
    assert(streamed == batch,
      s"stream/batch admission diverge: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    assert(streamed.nonEmpty)
    graft.Caches.clearTransient()
  }
}
