package graft.sources

import graft.operators.{SnapshotLog, SnapshotRefs}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._

/** The WRITE half of the `graft-snapshot` DSv2 face: an APPEND through
  * the standard DataFrame writer commits as ONE snapshot —
  *
  *   df.write.format("graft-snapshot").option("path", dir)
  *     .mode("append").save()
  *
  * Executors write task-local parquet files under a writer-unique root
  * (two racing writes can never clobber each other's files; an aborted
  * write's directory is unreferenced and swept by
  * [[SnapshotLog.removeOrphans]]); the DRIVER then publishes the
  * manifest: prior entries carried forward, the new files appended at
  * seq = the committed version, CAS put-if-absent with append-rebase
  * retries (an interleaved commit is never a logical conflict for a
  * pure append — the same progress argument as [[SnapshotLog.commit]]).
  * Nothing is visible until the manifest lands: a crashed job leaves
  * data files no reader resolves, the snapshot-log flavor of the
  * two-phase commit every DSv2 sink needs.
  *
  * `option("branch", name)` targets a [[SnapshotRefs]] branch instead:
  * the commit derives from the BRANCH head (a `#parent` header records
  * it) and CAS-advances the ref, so staged writes ride the
  * write–audit–publish flow straight from the DataFrame API.
  *
  * Supported column types mirror the read face: LONG, INT, DOUBLE,
  * FLOAT, BOOLEAN, STRING.
  */
private[sources] object SnapshotWrite {

  private[sources] def parquetSchema(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => b.optional(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType => b.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => b.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType =>
          b.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType => b.optional(PrimitiveTypeName.BINARY)
          .as(stringType()).named(f.name)
        case other => throw new IllegalArgumentException(
          s"graft-snapshot write: unsupported type $other for ${f.name}")
      }
    }
    b.named("graft_snapshot_write")
  }
}

private[sources] class SnapshotWriteBuilder(dir: String,
    branch: Option[String], info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new SnapshotBatchWrite(dir, branch, info.schema())
  }
}

/** one finished task file. */
private case class SnapFileCommit(path: String, rows: Long)
    extends WriterCommitMessage

private class SnapshotBatchWrite(dir: String, branch: Option[String],
    schema: StructType) extends BatchWrite {
  // writer-unique root, minted ONCE on the driver so every task of this
  // job (and only this job) lands under it
  private val root = SnapshotLog.writerRoot(
    s"$dir/data/${branch.map(b => s"ref-$b").getOrElse("append")}")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new SnapshotWriterFactory(root, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // (path, rows): the row counts folded TASK-SIDE ride into the
    // manifest for free — metadata-only COUNT needs no extra pass here
    val files = messages.collect {
      case SnapFileCommit(p, n) if n > 0 => (p, n)
    }.sortBy(_._1)
    branch match {
      case Some(name) =>
        val h = SnapshotRefs.head(dir, name)
        val prior = SnapshotLog.entries(dir, h)
        // headers() carries only table-level metadata (no stale parent)
        val carried = SnapshotLog.headers(dir, h)
        var done = false
        var attempts = 0
        while (!done) {
          attempts += 1
          require(attempts <= 1000, "snapshot write lost 1000 id races")
          val t = SnapshotLog.latest(dir) + 1
          val added = files.map { case (p, n) => SnapshotLog.FileEntry(
            p, "D", s"ref=$name", Map.empty, seq = t.toLong, rows = n) }
          if (SnapshotLog.publishEntries(dir, t, prior ++ added,
              Seq(SnapshotRefs.parentHeader(h),
                s"${SnapshotLog.RefHeader}\t$name") ++ carried)) {
            SnapshotRefs.advance(dir, name, h, t)
            done = true
          }
        }
      case None =>
        var done = false
        var attempts = 0
        while (!done) {
          attempts += 1
          require(attempts <= 1000, "snapshot write lost 1000 id races")
          val v = SnapshotLog.latest(dir)
          val prior = if (v > 0) SnapshotLog.entries(dir, v) else Nil
          val t = v + 1
          val added = files.map { case (p, n) => SnapshotLog.FileEntry(
            p, "D", "", Map.empty, seq = t.toLong, rows = n) }
          if (SnapshotLog.publishEntries(dir, t, prior ++ added,
              SnapshotLog.headers(dir, v)))
            done = true
        }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // best-effort: the files are unreferenced either way (orphan sweep)
    messages.foreach {
      case SnapFileCommit(p, _) if p.nonEmpty =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
      case _ =>
    }
  }
}

private class SnapshotWriterFactory(root: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(root, schema, partitionId, taskId)
}

/** Task-side parquet writer over the example Group API — lazy: a task
  * with zero rows writes no file (its commit message carries rows = 0
  * and the driver skips it). */
private class SnapshotDataWriter(root: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val msg = SnapshotWrite.parquetSchema(schema)
  private val factory = new SimpleGroupFactory(msg)
  private val file =
    s"$root/part-$partitionId-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
  private var writer: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(root))
      val conf = new Configuration()
      writer = ExampleParquetWriter.builder(new Path(file))
        .withConf(conf).withType(msg).build()
    }
    val g = factory.newGroup()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case LongType => g.add(f.name, row.getLong(i))
        case IntegerType => g.add(f.name, row.getInt(i))
        case DoubleType => g.add(f.name, row.getDouble(i))
        case FloatType => g.add(f.name, row.getFloat(i))
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case StringType => g.add(f.name,
          Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
        case other => throw new IllegalArgumentException(
          s"graft-snapshot write: unsupported type $other")
      }
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    SnapFileCommit(if (rows > 0) file else "", rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  override def close(): Unit = ()
}
