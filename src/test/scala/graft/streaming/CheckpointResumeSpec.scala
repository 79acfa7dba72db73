package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once resume from a REAL streaming checkpoint: a second
  * AvailableNow run against the same checkpointLocation must process
  * ONLY files that arrived after the first run — the committed offsets
  * survive the restart. This is the recovery contract every production
  * streaming deployment of the library leans on (the batch analogue —
  * reliable `Caches.barrier` checkpoints — is CheckpointModeSpec).
  */
class CheckpointResumeSpec extends SparkSpec {

  test("AvailableNow resumes from committed offsets, not from scratch") {
    import spark.implicits._
    val root = graft.Scratch.dirFor("ckpt_resume_spec", "x")
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    graft.Scratch.clear(src); graft.Scratch.clear(ckpt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    def addFile(name: String, lo: Long, hi: Long): Unit =
      (lo until hi).toDF("v").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/tmp_$name")

    def publish(name: String): Unit = {
      val part = new java.io.File(s"$root/tmp_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Seq[Long] = {
      seen.clear()
      val q = spark.readStream
        .schema("v LONG").parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => seen.add(r.getLong(0))); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq.sorted
    }

    addFile("a", 0L, 100L); publish("a")
    addFile("b", 100L, 200L); publish("b")
    assert(runOnce() == (0L until 200L))

    // new arrival AFTER the first run — the resumed query must process
    // exactly this file, nothing re-delivered
    addFile("c", 200L, 250L); publish("c")
    assert(runOnce() == (200L until 250L),
      "resume re-delivered already-committed data or missed the new file")

    // nothing new: the resumed query delivers zero rows
    assert(runOnce().isEmpty)
  }
}
