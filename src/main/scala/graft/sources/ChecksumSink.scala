package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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

private class ChecksumWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
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
}
