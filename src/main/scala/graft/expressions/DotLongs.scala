package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact int64 dot product of two long-array columns — the kernel under
  * the k-means assignment step ([[graft.llmdata.Embeddings
  * .assignToCentroids]]), where both sides are already micro-unit
  * quantized (vectors once at the scan, centroids by the floor-mean
  * update). Passing `a eq b` computes the squared norm. The
  * zip_with + aggregate higher-order-function form runs interpreted with
  * boxed lambdas per ELEMENT — at n·k pairs × 64 dims per Lloyd round
  * that dominated the whole clustering pass; this is one tight primitive
  * loop per pair, inside whole-stage codegen. Caller guarantees products
  * and sums stay below 2⁶³ (micro-units of unit-normalized embeddings:
  * |q| ≤ 1e6 → 64-element sums ≤ 6.4e13).
  */
case class DotLongs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // declared input types make misuse (int arrays, strings) an
  // analysis-time error instead of silent garbage from getLong on
  // 4-byte-element UnsafeArrayData — same rationale as RhpBandKeys
  // annotation omitted: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dotl"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotLongs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.DotLongs.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongs =
    copy(left = newLeft, right = newRight)
}

object DotLongs {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      // null elements contribute 0 (the library's producers emit
      // containsNull=false arrays; a null slot must not be read as an
      // undefined long)
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}
