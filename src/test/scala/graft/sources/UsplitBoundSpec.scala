package graft.sources

import graft.SparkSpec
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming U-split's plan-time delta is BOUNDED: a keys-declared
  * COW commit replays as its exact logical delta only while that delta
  * fits `maxDeltaRows` (default 1M) — a pathological rewrite that
  * changes more keys than the cap fails LOUDLY pointing at the batch
  * changeFeed instead of silently shipping half the table through the
  * driver. Raising the cap (or a genuinely churn-sized commit) streams
  * normally.
  */
class UsplitBoundSpec extends SparkSpec {

  private def cowTable(tag: String): String = {
    import spark.implicits._
    val dir = s"/tmp/graft-test/usplit-$tag/t"
    graft.Scratch.clear(s"/tmp/graft-test/usplit-$tag")
    val base = (0L until 400L).map(i => (i, i % 4, i * 2)).toDF("id", "m", "qty")
    SnapshotMerge.writeInitial(spark, base, dir, "m")
    SnapshotLog.commitKeysChange(dir, Seq("id", "m"))
    // a COW update touching 100 keys of partition m=1 (the planted
    // "large" delta relative to a tiny cap)
    val hits = SnapshotLog.read(spark, dir, SnapshotLog.latest(dir))
      .filter(col("m") === 1).select(col("id"), col("m"))
    SnapshotMerge(spark, dir, "m", Seq("id", "m"),
      hits.filter(lit(false)),
      hits.withColumn("new_qty", lit(7L)),
      hits.filter(lit(false)).withColumn("qty", lit(0L))
        .select("id", "m", "qty"),
      Map("qty" -> "new_qty"))
    dir
  }

  private def drain(dir: String, cap: Long, name: String): Unit = {
    val q = spark.readStream.format("graft-snapshot")
      .option("path", dir).option("changeFeed", "true")
      .option("maxDeltaRows", cap.toString).load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("a COW delta above maxDeltaRows fails loudly, naming the fix") {
    val dir = cowTable("loud")
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException](drain(dir, 10L, "usplit_loud"))
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxDeltaRows"),
      s"expected the loud cap refusal, got: $msg")
    assert(msg.contains("changeFeed"),
      "the refusal must point at the batch changeFeed")
  }

  test("the same commit streams fine when the delta fits the cap") {
    val dir = cowTable("fits")
    drain(dir, 1000L, "usplit_fits")
    val out = spark.sql("SELECT * FROM usplit_fits")
    // the initial commit streams 400 inserts; the COW commit's exact
    // logical delta is 100 updated keys (the U-split)
    assert(out.filter(col("_op") === "I").count() == 400L)
    assert(out.filter(col("_op") === "U").count() == 100L)
    assert(out.filter(col("_op") === "D").count() == 0L)
  }
}
