package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** k-counter Misra–Gries buffer: the deterministic heavy-hitter sketch
  * state (Misra & Gries 1982), with the mergeable-summaries fold
  * (Agarwal et al., PODS 2012) so partial buffers combine in any order
  * without losing the n/(k+1) additive bound.
  */
final class MgAggBuffer(val k: Int) {
  val m = scala.collection.mutable.HashMap.empty[String, Long]
  var n = 0L

  /** amortized-O(1) MG update: hit increments; miss inserts if room,
    * else decrements every counter (evicting zeros) — each such event
    * burns k+1 count units, so ≤ n/(k+1) events total. */
  def add(key: String): Unit = {
    n += 1L
    m.get(key) match {
      case Some(c) => m.update(key, c + 1L)
      case None =>
        if (m.size < k) m.update(key, 1L)
        else for ((kk, c) <- m.toArray)
          if (c == 1L) m.remove(kk) else m.update(kk, c - 1L)
    }
  }

  /** Agarwal merge: pointwise sum, then subtract the (k+1)-th largest
    * and evict non-positives if more than k survive. */
  def absorb(o: MgAggBuffer): Unit = {
    n += o.n
    o.m.foreach { case (kk, c) => m.update(kk, m.getOrElse(kk, 0L) + c) }
    if (m.size > k) {
      val vk1 = m.values.toArray.sortWith(_ > _).apply(k)
      for ((kk, c) <- m.toArray)
        if (c > vk1) m.update(kk, c - vk1) else m.remove(kk)
    }
  }
}

/** Native Misra–Gries AGGREGATE — `mg(key, k)` in SQL: the two-phase
  * heavy-hitter sketch as a Catalyst [[TypedImperativeAggregate]],
  * replacing the mapPartitions + driver-fold formulation with the plan
  * Spark owns: each task folds rows into a k-counter summary (O(1)
  * amortized per row, O(k) memory), PARTIAL buffers serialize as ≤k
  * (key, count) pairs plus the row count, and the final merge applies
  * the mergeable-summaries rule — the shuffle carries ≤ k entries per
  * (task, group) whatever the key domain, which is the point of MG at
  * 100 TB (the ~30M-distinct-key x10 probe never shuffles its domain).
  *
  * Returns `struct(n BIGINT, entries ARRAY<STRUCT<key STRING, cnt
  * BIGINT>>)` with entries sorted by key (deterministic output for a
  * deterministic merge tree); every key with true count > n/(k+1) is
  * guaranteed PRESENT in entries (superset-of-heavy), counts are
  * within n/(k+1) below truth. Nulls are skipped. `MisraGriesSpec`
  * pins the native face against the library fold, the superset
  * guarantee under hostile partitionings, and the two-phase
  * ObjectHashAggregate plan shape.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgAggBuffer] with ImplicitCastInputTypes {

  require(k > 0, "mg: k must be positive")

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "mg"

  override def createAggregationBuffer(): MgAggBuffer = new MgAggBuffer(k)

  override def update(b: MgAggBuffer, input: InternalRow): MgAggBuffer = {
    val v = child.eval(input)
    // UTF8String may be a reused buffer — toString copies
    if (v != null) b.add(v.toString)
    b
  }

  override def merge(b: MgAggBuffer, o: MgAggBuffer): MgAggBuffer = {
    b.absorb(o); b
  }

  override def eval(b: MgAggBuffer): Any = {
    val entries = b.m.toArray.sortBy(_._1).map { case (kk, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(kk), c)): Any
    }
    new GenericInternalRow(
      Array[Any](b.n, new GenericArrayData(entries)))
  }

  override def serialize(b: MgAggBuffer): Array[Byte] = {
    val keys = b.m.toArray
    val keyBytes = keys.map { case (kk, _) => kk.getBytes(UTF_8) }
    val size = 8 + 4 + keyBytes.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(b.n)
    bb.putInt(keys.length)
    var i = 0
    while (i < keys.length) {
      bb.putInt(keyBytes(i).length)
      bb.put(keyBytes(i))
      bb.putLong(keys(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgAggBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MgAggBuffer(k)
    b.n = bb.getLong
    val cnt = bb.getInt
    var i = 0
    while (i < cnt) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.m.update(new String(arr, UTF_8), bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
