package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact micro-unit dot product of two float-array columns — the int64
  * kernel under every cosine in the similarity family
  * ([[graft.llmdata.Embeddings]]): Σ q(aᵢ)·q(bᵢ) with
  * q(x) = floor(x·1e6 + 0.5) (floor of identical doubles is
  * bit-deterministic, so the DuckDB oracles reproduce it with the same
  * formula). The zip_with + aggregate higher-order-function form runs
  * interpreted per ELEMENT with boxed lambys — at millions of candidate
  * pairs × 64 dims that dominated verification; this is one tight
  * primitive loop per pair, inside whole-stage codegen.
  */
case class DotQuant6(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dotq6"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotQuant6.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.DotQuant6.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQuant6 =
    copy(left = newLeft, right = newRight)
}

object DotQuant6 {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += quant6(a.getFloat(i)) * quant6(b.getFloat(i))
      i += 1
    }
    s
  }

  @inline def quant6(x: Float): Long =
    math.floor(x.toDouble * 1e6 + 0.5).toLong
}
