package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-bounded max-heap buffer: keeps the k SMALLEST longs seen. */
final class BottomKBuffer(val k: Int) {
  // binary max-heap over heap(0..size-1); root = largest kept value, so
  // a new smaller value evicts it in O(log k)
  val heap = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit =
    if (size < k) {
      var i = size
      heap(i) = v
      size += 1
      while (i > 0 && heap((i - 1) / 2) < heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v < heap(0)) {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && heap(l) > heap(m)) m = l
        if (r < size && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else {
          val t = heap(m); heap(m) = heap(i); heap(i) = t
          i = m
        }
      }
    }
}

/** Native k-smallest AGGREGATE — `bottomk(col, k)` in SQL: the
  * KMV-sketch primitive as a Catalyst [[TypedImperativeAggregate]]
  * (the (b) tier for aggregation, next to the scalar native
  * expressions). Spark plans it as a two-phase ObjectHashAggregate:
  * each task folds rows into a k-long max-heap (O(log k) per row,
  * O(k) memory), PARTIAL buffers serialize as k packed longs, and the
  * final merge folds heaps — the shuffle carries ≤ k longs per (task,
  * group) whatever the input, which is the whole point of a bottom-k
  * sketch at 100 TB. Returns the kept values sorted ASCENDING (so
  * element i is the (i+1)-th order statistic and the k-th is the KMV
  * theta). Nulls are skipped; an all-null/empty group yields an empty
  * array. `BottomKSpec` pins heap vs sort equality, partition
  * invariance, the planned two-phase shape, and value identity with
  * the typed-Aggregator formulation the KMV queries ship.
  */
case class BottomK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with ImplicitCastInputTypes {

  require(k > 0, "bottomk: k must be positive")

  // analysis-time contract: narrower integrals implicitly widen to
  // LONG; a type Cast can't bridge fails analysis instead of throwing
  // ClassCastException inside update() at execution (inferred type —
  // AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk"

  override def createAggregationBuffer(): BottomKBuffer =
    new BottomKBuffer(k)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BottomKBuffer, o: BottomKBuffer): BottomKBuffer = {
    var i = 0
    while (i < o.size) { b.insert(o.heap(i)); i += 1 }
    b
  }

  override def eval(b: BottomKBuffer): Any = {
    val out = java.util.Arrays.copyOf(b.heap, b.size)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new BottomKBuffer(k)
    var i = 0
    while (i < n) { b.insert(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK =
    copy(child = newChildren.head)
}
