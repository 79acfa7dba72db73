package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real DataSource V2 connector (`spark.read.format("graft-synth")`):
  * a deterministic closed-form trade generator with genuine PARTITION
  * PLANNING (the row range splits into `partitions` input partitions —
  * executors generate their slice independently, nothing is driver-
  * materialized) and COLUMN PRUNING (`SupportsPushDownRequiredColumns`
  * — a projection reaches the reader, which then computes only the
  * requested columns). The connector surface every external system
  * integration uses, demonstrated end-to-end: closed-form row i is
  *
  *   trade_id   = i
  *   entity_id  = i mod 97
  *   price_cents = 10000 + (i*31) mod 5000
  *   qty        = 1 + i mod 50
  *
  * so a SQL oracle reproduces every value. Options: `rows` (total,
  * default 10000), `partitions` (default 8).
  */
class SynthTrades extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthTrades.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new SynthTable
}

object SynthTrades {
  val schema: StructType = StructType(Seq(
    StructField("trade_id", LongType, nullable = false),
    StructField("entity_id", LongType, nullable = false),
    StructField("price_cents", LongType, nullable = false),
    StructField("qty", LongType, nullable = false)))

  /** closed-form cell value — shared by the reader and the spec */
  def cell(i: Long, field: String): Long = field match {
    case "trade_id" => i
    case "entity_id" => i % 97
    case "price_cents" => 10000L + (i * 31) % 5000
    case "qty" => 1L + i % 50
  }
}

private class SynthTable extends Table with SupportsRead {
  override def name(): String = "graft_synth_trades"
  override def schema(): StructType = SynthTrades.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(
      options.getLong("rows", 10000L),
      options.getInt("partitions", 8),
      options.getLong("batchRows", 5000L))
}

private class SynthScanBuilder(rows: Long, partitions: Int,
    batchRows: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SynthTrades.schema
  private var lo = 0L          // inclusive trade_id lower bound
  private var hi = rows        // exclusive trade_id upper bound
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands the pruned projection; an empty one (count(*)) is legal
    required = requiredSchema
  /** `trade_id` range predicates narrow the GENERATED range — the
    * connector-side analogue of partition pruning: rows outside the
    * bounds are never produced, not produced-then-filtered. Everything
    * else is left for Spark to evaluate (returned as residual).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue)
      case _ => None
    }
    val (accepted, residual) = filters.partition {
      case EqualTo("trade_id", v) if num(v).isDefined =>
        val x = num(v).get; lo = math.max(lo, x); hi = math.min(hi, x + 1); true
      case GreaterThan("trade_id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get + 1); true
      case GreaterThanOrEqual("trade_id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get); true
      case LessThan("trade_id", v) if num(v).isDefined =>
        hi = math.min(hi, num(v).get); true
      case LessThanOrEqual("trade_id", v) if num(v).isDefined =>
        hi = math.min(hi, num(v).get + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new SynthScan(lo, math.max(lo, hi), partitions, batchRows, required)
}

private case class SynthRange(start: Long, end: Long) extends InputPartition

private[sources] class SynthScan(val lo: Long, val hi: Long,
    partitions: Int, batchRows: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, partitions, batchRows,
      required.fieldNames)
  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    if (span <= 0) return Array(SynthRange(0, 0))
    val n = math.max(1, partitions)
    val step = math.max(1L, (span + n - 1) / n)
    (lo until hi by step)
      .map(s => SynthRange(s, math.min(hi, s + step)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(start, end) = partition.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow =
        new GenericInternalRow(
          fields.map(f => SynthTrades.cell(i, f): Any))
      override def close(): Unit = ()
    }
  }
}

/** Offset = next unread trade_id (row position in [lo, hi)). */
private[sources] case class SynthOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/** The STREAMING face of the same generator: `readStream.format(
  * "graft-synth")` delivers the row range as micro-batches of
  * `batchRows` (admission control — latestOffset advances at most one
  * batch per trigger; `Trigger.AvailableNow` therefore replays the
  * whole range in ceil(span/batchRows) ordered batches and stops).
  * Offsets are plain row positions, so restart-from-checkpoint resumes
  * mid-range exactly; the union of all batches is provably the batch
  * read (`Dsv2Spec`).
  */
private[sources] class SynthMicroBatchStream(lo: Long, hi: Long,
    partitions: Int, batchRows: Long, fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = SynthOffset(lo)
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(math.max(1L, batchRows))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val pos = start.asInstanceOf[SynthOffset].pos
    val step = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        m.maxRows()
      case _ => math.max(1L, batchRows)
    }
    SynthOffset(math.min(hi, pos + math.max(1L, step)))
  }
  override def reportLatestOffset(): Offset = SynthOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].pos
    val e = end.asInstanceOf[SynthOffset].pos
    if (e <= s) return Array.empty
    val n = math.max(1, partitions)
    val step = math.max(1L, (e - s + n - 1) / n)
    (s until e by step)
      .map(x => SynthRange(x, math.min(e, x + step)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(fields)
  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}
