package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming face of the graft-checksum sink: epoch-granular
  * two-phase commit with a replayed-epoch no-op. Three claims pinned:
  * the AvailableNow stream lands on the BATCH manifest totals (epoch
  * slicing is invisible), a replayed epoch leaves the manifest
  * byte-identical (exactly-once under the engine's at-least-once epoch
  * redelivery), and a restart on the same checkpoint republishes
  * nothing.
  */
class ChecksumStreamSpec extends SparkSpec {

  private def tmp(tag: String): String = {
    val d = graft.Scratch.dirFor(s"ckstream_$tag", "spec")
    graft.Scratch.clear(d)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    d
  }

  private def runStream(dir: String, rows: Long, batchRows: Long): Unit = {
    val q = spark.readStream.format("graft-synth")
      .option("rows", rows).option("partitions", 3)
      .option("batchRows", batchRows)
      .load()
      .select(col("trade_id"))
      .writeStream.format("graft-checksum")
      .option("path", s"$dir/manifest.json")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("multi-epoch stream lands on the batch manifest totals") {
    val dir = tmp("e2e")
    runStream(dir, rows = 10000L, batchRows = 1024L) // 10 epochs
    val m = ChecksumStreamingWrite.readManifest(s"$dir/manifest.json").get
    // closed forms over 0 until 10000
    val ids = 0L until 10000L
    assert(m.rows == 10000L)
    assert(m.sum == ids.sum)
    assert(m.xor == ids.foldLeft(0L)(_ ^ _))
    assert(m.lastEpoch >= 9L, s"expected >=10 epochs, got ${m.lastEpoch}")
  }

  test("replayed epoch is a no-op: manifest byte-identical") {
    val dir = tmp("replay")
    val path = s"$dir/manifest.json"
    val w = new ChecksumStreamingWrite(path)
    def msg(rows: Long, sum: Long, xor: Long): WriterCommitMessage = {
      // the case class is file-private — build the message through a
      // real task writer, the same path production follows
      val dw = new ChecksumWriterFactory().createWriter(0, 0L, 0L)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      var s = 0L; var x = 0L; var n = 0L
      var v = 1L
      while (n < rows) { row.setLong(0, v); dw.write(row); s += v; x ^= v; n += 1; v += 1 }
      assert(s == sum && x == xor, "fixture self-check")
      dw.commit()
    }
    w.commit(0L, Array(msg(3, 6, 1L ^ 2L ^ 3L)))
    val after0 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)).toSeq
    // the engine redelivers epoch 0 after a simulated driver restart —
    // same task totals arrive again; the manifest must not double-fold
    w.commit(0L, Array(msg(3, 6, 1L ^ 2L ^ 3L)))
    val replayed = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)).toSeq
    assert(replayed == after0, "replayed epoch mutated the manifest")
    // a genuinely new epoch folds in
    w.commit(1L, Array(msg(3, 6, 1L ^ 2L ^ 3L)))
    val m = ChecksumStreamingWrite.readManifest(path).get
    assert(m.rows == 6L && m.sum == 12L && m.lastEpoch == 1L)
  }

  test("restart on a finished checkpoint republishes nothing") {
    val dir = tmp("restart")
    runStream(dir, rows = 5000L, batchRows = 2000L)
    val path = s"$dir/manifest.json"
    val first = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)).toSeq
    runStream(dir, rows = 5000L, batchRows = 2000L) // same checkpoint
    val second = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)).toSeq
    assert(ChecksumStreamingWrite.readManifest(path).get.rows == 5000L)
    // totals unchanged; the epoch high-water mark may legally advance
    // by one empty flush epoch, so compare the fold fields, not bytes
    def totals(b: Seq[Byte]) = {
      val s = new String(b.toArray, "UTF-8")
      Seq("n_rows", "sum_id", "xor_id").map(f =>
        s"""\"$f\":(-?\\d+)""".r.findFirstMatchIn(s).get.group(1))
    }
    assert(totals(second) == totals(first), "restart changed the totals")
  }
}
