package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (`df.write.format("graft-checksum")`): the
  * transactional two-phase commit protocol every real sink implements,
  * demonstrated end-to-end — each task's [[DataWriter]] folds its
  * partition into (rows, sum, xor) and emits a [[WriterCommitMessage]];
  * the DRIVER's [[BatchWrite.commit]] aggregates the task messages and
  * atomically publishes one manifest (write temp + move). A failed task
  * never publishes: until commit runs, the previous manifest stays
  * intact (`Dsv2SinkSpec` pins exactly that). The folds are
  * order/partition-invariant (count/sum/xor), so the manifest is
  * deterministic under any parallelism — and SQL-reproducible, which is
  * how the driver oracle hash-gates a SINK.
  *
  * Contract: the input's FIRST column must be LONG (the id being
  * checksummed); `path` option = manifest destination (JSON, one object).
  */
class ChecksumSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-checksum"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the input frame
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChecksumTable(schema)
}

private class ChecksumTable(schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft_checksum_sink"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.nonEmpty &&
      info.schema().fields(0).dataType == LongType,
      s"graft-checksum: first column must be LONG, got ${info.schema()}")
    val path = info.options.get("path")
    require(path != null && path.nonEmpty,
      "graft-checksum: 'path' option is required")
    // advertising TRUNCATE requires the builder to IMPLEMENT
    // SupportsTruncate — without it df.write.mode("overwrite") fails at
    // analysis despite the capability. For this stateless sink truncate
    // is a no-op: the manifest is atomically replaced at commit either
    // way, so overwrite == append.
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChecksumBatchWrite(path)
        override def toStreaming: StreamingWrite =
          new ChecksumStreamingWrite(path)
      }
    }
  }
}

private final case class ChecksumMsg(rows: Long, sum: Long, xor: Long)
    extends WriterCommitMessage

private class ChecksumBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[ChecksumMsg])
    val rows = msgs.map(_.rows).sum
    val sum = msgs.map(_.sum).sum
    val xor = msgs.foldLeft(0L)(_ ^ _.xor)
    val json =
      s"""{"n_rows":$rows,"sum_id":$sum,"xor_id":$xor}"""
    // atomic publish: temp file + move — a crash between the two leaves
    // the previous manifest intact, never a torn one
    val target = java.nio.file.Paths.get(path)
    if (target.getParent != null)
      java.nio.file.Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  // stateless tasks: nothing partial ever hit the destination
}

private class ChecksumWriterFactory extends DataWriterFactory
    with StreamingDataWriterFactory {
  private def writer(): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      private var xor = 0L
      override def write(record: InternalRow): Unit = {
        val v = record.getLong(0)
        rows += 1; sum += v; xor ^= v
      }
      override def commit(): WriterCommitMessage = ChecksumMsg(rows, sum, xor)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = writer()
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = writer()
}

/** The STREAMING face of the same two-phase commit: one sink-side
  * transaction per epoch. Task folds are identical to the batch path;
  * the driver's `commit(epochId, msgs)` folds the epoch's delta into
  * the RUNNING manifest `{n_rows, sum_id, xor_id, last_epoch}` and
  * atomically republishes it (temp + move, like batch). Exactly-once
  * despite the engine's at-least-once epoch replay: a commit whose
  * `epochId <= last_epoch` is a NO-OP — after a restart Spark re-runs
  * the last epoch it cannot prove committed, and the manifest's own
  * epoch high-water mark deduplicates it (the sink-side analogue of the
  * per-batchId foreachBatch idiom, but inside the sink where a 100 TB
  * ingest wants it — no user code in the commit path).
  *
  * Single-writer per manifest path (one streaming query), which is the
  * standard exactly-once sink contract; commit runs on the driver, so
  * the read-modify-move needs no cross-process lock.
  */
private[sources] class ChecksumStreamingWrite(path: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ChecksumWriterFactory
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val prev = ChecksumStreamingWrite.readManifest(path)
    // replayed epoch: the delta is already folded in — publish nothing,
    // the manifest on disk is the proof
    if (prev.exists(_.lastEpoch >= epochId)) return
    val msgs = messages.map(_.asInstanceOf[ChecksumMsg])
    val rows = prev.map(_.rows).getOrElse(0L) + msgs.map(_.rows).sum
    val sum = prev.map(_.sum).getOrElse(0L) + msgs.map(_.sum).sum
    val xor = msgs.foldLeft(prev.map(_.xor).getOrElse(0L))(_ ^ _.xor)
    val json = s"""{"n_rows":$rows,"sum_id":$sum,"xor_id":$xor,""" +
      s""""last_epoch":$epochId}"""
    val target = java.nio.file.Paths.get(path)
    if (target.getParent != null)
      java.nio.file.Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  // failed epoch: nothing partial ever reached the manifest
}

private[sources] object ChecksumStreamingWrite {
  final case class Manifest(rows: Long, sum: Long, xor: Long,
      lastEpoch: Long)
  /** parse the running manifest; None when absent (first epoch) or when
    * the file is a BATCH manifest (no last_epoch — a streaming query
    * pointed at a batch manifest path starts its own ledger fresh
    * rather than folding unrelated totals).
    */
  def readManifest(path: String): Option[Manifest] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return None
    val s = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    def field(name: String): Option[Long] =
      s"""\"$name\":(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    for {
      ep <- field("last_epoch")
      r <- field("n_rows"); su <- field("sum_id"); x <- field("xor_id")
    } yield Manifest(r, su, x, ep)
  }
}
